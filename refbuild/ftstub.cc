// Stub for fonte_ft_creation when FreeType is unavailable (the rendering
// stack is disabled: LIBTSD_USE_FREETYPE=0).
#include "tsd/tsd.hpp"
#include "tsd/vue/image.hpp"
namespace tsd::vue {
sptr<Font> fonte_ft_creation() { return {}; }
}
