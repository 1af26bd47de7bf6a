"""§2.10 extension hooks: strategy registry + ignore_exceptions."""

from __future__ import annotations

import pytest

from fluent_plugin_opensearch_spark.plans.hooks import (
    exception_matches,
    ignoring_exceptions,
    register,
    resolve,
)


def test_registry_roundtrip():
    @register("double_it")
    def double_it(x):
        return x * 2

    assert resolve("double_it")(21) == 42
    with pytest.raises(KeyError):
        resolve("nope")


class Base(Exception):
    pass


class Child(Base):
    pass


def test_exception_matches_inheritance():
    """Reference matches by is_a? — subclasses of an allowlisted class
    count (out_opensearch.rb:448-456)."""
    assert exception_matches(Child(), ("Base",))
    assert exception_matches(Child(), ("Child",))
    assert not exception_matches(Base(), ("Child",))
    assert exception_matches(ValueError("x"), ("Exception",))


def test_ignoring_exceptions_wrapper():
    seen = []

    def flaky(kind):
        raise kind("boom")

    wrapped = ignoring_exceptions(flaky, ignore=("Base",), on_ignored=seen.append)
    assert wrapped(Child) is None  # swallowed, flush "successful"
    assert len(seen) == 1
    with pytest.raises(ValueError):
        wrapped(ValueError)  # not allowlisted → propagates
