"""Column-level helper functions (pure Catalyst expressions)."""

from .url import host_of, normalize_url, registered_domain  # noqa: F401
