from .lifelong import UserMemoryStore, incremental_update

__all__ = ["UserMemoryStore", "incremental_update"]
