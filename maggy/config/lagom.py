"""`from maggy.config.lagom import LagomConfig` (reference path; the
reference's LagomConfig is the shared config base)."""

from maggy.config import LagomConfig

__all__ = ["LagomConfig"]
