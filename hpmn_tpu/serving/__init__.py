from .lifelong import UserMemoryStore, incremental_update
from .protocol import O1_FAMILIES

__all__ = ["UserMemoryStore", "incremental_update", "O1_FAMILIES",
           "HistoryStore", "load_bundle", "ServingServer", "ServingClient",
           "ShardedServingClient", "AotStore", "load_aot_store",
           "export_serving"]


def __getattr__(name):
    # Lazy: the daemon/client pull in sockets/threads (and aot pulls
    # jax.export) that most training imports never need.
    if name in ("HistoryStore", "load_bundle"):
        from . import history
        return getattr(history, name)
    if name == "ServingServer":
        from .server import ServingServer
        return ServingServer
    if name == "ServingClient":
        from .client import ServingClient
        return ServingClient
    if name == "ShardedServingClient":
        from .sharded import ShardedServingClient
        return ShardedServingClient
    if name in ("AotStore", "load_aot_store", "export_serving"):
        from . import aot
        return getattr(aot, name)
    raise AttributeError(name)
