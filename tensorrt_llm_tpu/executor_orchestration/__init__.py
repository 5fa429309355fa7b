from .broadcast import RequestBroadcaster, SerializableBatch  # noqa: F401
