"""Reusable column functions (engine-agnostic, reproducible hashing)."""

from .columns import dot, md5_long, norm
