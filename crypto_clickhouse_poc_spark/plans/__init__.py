"""Physical table layout, retention, dedup views, and schema migrations."""

from . import layout, migrate  # noqa: F401
