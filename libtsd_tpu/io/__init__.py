from .streamio import (RingBuffer, Rebuffer, cs16_to_cf32, cu8_to_cf32,  # noqa: F401
                       deinterleave, interleave, native_available,
                       IqFileReader)
from .runner import StreamRunner  # noqa: F401
