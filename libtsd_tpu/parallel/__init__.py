from .mesh import (make_mesh, channel_sharding,  # noqa: F401
                   NamedSharding, P)
from .halo import (halo_exchange_left, sharded_fir, sharded_chain,  # noqa: F401
                   iir_time_sharded)
from .chain import sharded_fir_periodogram4096  # noqa: F401
from .fm import sharded_fm_receiver  # noqa: F401
