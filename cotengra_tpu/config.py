"""Global configuration knobs (reference analog: the default-
implementation global + context manager in ``contract.py:13-31`` and the
env-var conventions of ``parallel.py:59-67``).
"""

import contextlib
import threading

_LOCAL = threading.local()

_DEFAULTS = {
    "implementation": None,  # None = dot_general; "pallas" = fused kernels
    "slice_batch": None,
    "precision": None,
}


def _state():
    try:
        return _LOCAL.state
    except AttributeError:
        _LOCAL.state = dict(_DEFAULTS)
        return _LOCAL.state


def get_default(key):
    return _state()[key]


def set_default(key, value):
    if key not in _DEFAULTS:
        raise KeyError(
            f"Unknown option {key!r}; have {sorted(_DEFAULTS)}"
        )
    _state()[key] = value


def get_default_implementation():
    return get_default("implementation")


def set_default_implementation(impl):
    """Set the default executor implementation: None (dot_general) or
    'pallas' (fused kernels where applicable)."""
    set_default("implementation", impl)


@contextlib.contextmanager
def default_implementation(impl):
    """Context manager temporarily switching the executor implementation."""
    old = get_default("implementation")
    set_default("implementation", impl)
    try:
        yield
    finally:
        set_default("implementation", old)


@contextlib.contextmanager
def default_options(**kwargs):
    """Context manager temporarily overriding any executor defaults."""
    state = _state()
    old = {k: state[k] for k in kwargs}
    for k, v in kwargs.items():
        set_default(k, v)
    try:
        yield
    finally:
        state.update(old)
