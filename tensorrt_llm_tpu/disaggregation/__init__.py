from .params import DisaggregatedParams  # noqa: F401
from .transceiver import (InProcessKvTransport, KvCacheTransceiver,  # noqa: F401
                          KvTransport)
