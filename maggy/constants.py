"""Constants facade (reference `maggy/constants.py:16-40`): allowed
user-function return datatypes, re-expressed without sharing code."""

from __future__ import annotations

import numbers

try:
    import numpy as np

    _NUMPY_NUMBER: tuple = (np.number,)
except ImportError:  # numpy is baked into this environment, but stay import-safe
    _NUMPY_NUMBER = ()


class USER_FCT:
    """User training function specifics (reference constants.py:23-27)."""

    RETURN_TYPES = (float, int, *_NUMPY_NUMBER, dict)
    NUMERIC_TYPES = (float, int, *_NUMPY_NUMBER, numbers.Number)
