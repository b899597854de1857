"""Index-kind registry: serialized `kind` string -> index class."""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Any] = {}


def register(cls: Any) -> Any:
    _REGISTRY[cls.kind] = cls
    return cls


def resolve(kind: str) -> Any:
    try:
        return _REGISTRY[kind]
    except KeyError:
        raise ValueError(f"unknown index kind '{kind}'") from None


def known_kinds() -> list[str]:
    return sorted(_REGISTRY)


def _ensure_builtin() -> None:
    # Import built-in families for side-effect registration.
    from . import flat  # noqa: F401

    try:
        from . import ivf_flat  # noqa: F401
        from . import ivf_pq  # noqa: F401
    except ImportError:
        pass
    try:
        from ..parallel import sharded  # noqa: F401
    except ImportError:
        pass


builtin_loader: Callable[[], None] = _ensure_builtin
