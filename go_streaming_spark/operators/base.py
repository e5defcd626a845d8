"""Operator model.

Reference operators are factories producing engines that consume events and
emit events (`pkg/processing/operator_repository.go:35-168`).  Spark-first
re-expression: an Operator is a named pure function ``DataFrame -> DataFrame``
over envelope DataFrames.  Catalyst fuses chains of them into single
whole-stage-codegen stages, which replaces the reference's
goroutine-per-operator pipelining (`pkg/processing/operator_engine.go:64-105`)
with something that actually scales.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Operator:
    """A named DataFrame transform; composable with ``>>``."""

    name: str
    fn: Callable[[DataFrame], DataFrame]
    params: dict = field(default_factory=dict)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def __rshift__(self, other: "Operator") -> "Operator":
        return compose(self, other)

    def __repr__(self) -> str:  # pragma: no cover
        ps = ", ".join(f"{k}={v!r}" for k, v in self.params.items())
        return f"{self.name}({ps})"


def op(name: str, **params) -> Callable[[Callable[[DataFrame], DataFrame]], Operator]:
    """Wrap a plain function as an Operator (decorator-style helper)."""
    def wrap(fn: Callable[[DataFrame], DataFrame]) -> Operator:
        return Operator(name=name, fn=fn, params=params)
    return wrap


def compose(*ops: Operator) -> Operator:
    """Chain operators left-to-right (the builder's ConnectTo chain,
    `pkg/processing/query_builder.go:158-194`)."""
    def fn(df: DataFrame) -> DataFrame:
        for o in ops:
            df = o(df)
        return df
    return Operator(name=" >> ".join(o.name for o in ops), fn=fn)
