"""Version facade (reference `maggy/version.py:17`)."""

__version__ = "1.1.2+spark"
