from . import events, ingest  # noqa: F401
