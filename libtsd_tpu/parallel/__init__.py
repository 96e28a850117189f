from .mesh import (make_mesh, channel_sharding,  # noqa: F401
                   NamedSharding, P)
from .halo import halo_exchange_left, sharded_fir, sharded_chain  # noqa: F401
from .chain import sharded_fir_periodogram4096  # noqa: F401
