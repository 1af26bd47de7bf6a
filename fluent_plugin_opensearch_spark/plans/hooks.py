"""Extension hooks (SURVEY.md §2.10).

The reference loads user-supplied strategy classes by name
(``sniffer_class_name`` / ``selector_class_name``,
out_opensearch.rb:392-404) and swallows configured exception classes
including subclasses (``ignore_exceptions``,
out_opensearch.rb:448-456,1129-1139). Spark analogs:

  * ``registry`` — config-driven strategy callables resolved by name
    (our stage functions compose with ``df.transform``, so a strategy
    is just a registered ``DataFrame -> DataFrame`` callable).
  * ``ignoring_exceptions`` — a batch-writer wrapper that treats
    allowlisted exception types (by name, inheritance-aware) as a
    skipped-but-successful flush, exactly like the reference's rescue.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable | None = None):
    """Register a strategy callable under a config-addressable name.
    Usable as a decorator (``@register("my_stage")``) or direct call."""
    if fn is not None:
        _REGISTRY[name] = fn
        return fn

    def deco(f: Callable) -> Callable:
        _REGISTRY[name] = f
        return f

    return deco


def resolve(name: str) -> Callable:
    """Look up a strategy by name (configure-time failure on typos,
    like the reference's Object.const_get raising at configure)."""
    if name not in _REGISTRY:
        raise KeyError(f"no strategy registered under {name!r} (have: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


def exception_matches(exc: BaseException, allowed_names: tuple[str, ...]) -> bool:
    """Inheritance-aware class-name match (the reference walks
    ``Object.const_get(name)`` and uses ``is_a?`` —
    out_opensearch.rb:448-456): true when the exception's class or ANY
    ancestor class has an allowlisted name."""
    mro_names = {c.__name__ for c in type(exc).__mro__}
    return bool(mro_names & set(allowed_names))


def ignoring_exceptions(
    fn: Callable[..., Any],
    ignore: tuple[str, ...],
    on_ignored: Callable[[BaseException], None] | None = None,
) -> Callable[..., Any]:
    """Wrap a batch write so allowlisted exceptions become a logged
    no-op ('the flush is considered successful', README.md ignore_
    exceptions docs) instead of a task failure + buffer retry."""

    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except BaseException as e:  # noqa: BLE001 — allowlist decides
            if exception_matches(e, ignore):
                if on_ignored:
                    on_ignored(e)
                return None
            raise

    return wrapped
