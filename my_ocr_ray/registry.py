"""Step registry + declarative pipeline specs (the user-extension surface).

Ray-Data-native form of the reference's config-driven construction
(``@PIPELINES.register_module()`` + ``Compose`` over dict configs,
``mmocr/datasets/builder.py:3-14``, SURVEY.md §2.10): a named registry of
batch-callables / callable classes, and ``build_pipeline`` compiling a list
of step dicts into a chained Dataset transform.

A step dict is ``{"type": <registered name>, ...kwargs}``. Plain functions
become task-based ``map_batches(fn, fn_kwargs=...)``; classes become
actor-pool stages (``concurrency``/``batch_size``/constructor kwargs pass
through). Users register their own steps with :func:`register_step` —
any ``fn(batch: pa.Table, **kw) -> pa.Table`` qualifies.
"""
from __future__ import annotations

import inspect
from typing import Callable

STEPS: dict[str, Callable] = {}


def register_step(name: str | None = None):
    """Decorator: add a batch fn or callable class to the registry."""

    def deco(obj):
        key = name or obj.__name__
        if key in STEPS and STEPS[key] is not obj:
            raise ValueError(f"step {key!r} already registered")
        STEPS[key] = obj
        return obj

    return deco


def build_step(ds, spec: dict):
    """Apply one step spec to a Dataset."""
    spec = dict(spec)
    kind = spec.pop("type")
    if kind not in STEPS:
        raise KeyError(f"unknown step {kind!r}; registered: {sorted(STEPS)}")
    obj = STEPS[kind]
    exec_kwargs = {
        k: spec.pop(k)
        for k in ("batch_size", "concurrency", "num_cpus", "num_gpus")
        if k in spec
    }
    if inspect.isclass(obj):
        return ds.map_batches(
            obj,
            batch_format="pyarrow",
            fn_constructor_kwargs=spec,
            **exec_kwargs,
        )
    return ds.map_batches(
        obj, batch_format="pyarrow", fn_kwargs=spec, **exec_kwargs
    )


def build_pipeline(specs: list[dict]):
    """Compile step specs into a Dataset -> Dataset callable (Compose)."""

    def run(ds):
        for spec in specs:
            ds = build_step(ds, spec)
        return ds

    return run


def _register_builtins() -> None:
    from .analysis import (
        fingerprint_batch,
        lang_id_batch,
        quality_batch,
        token_count_batch,
    )
    from .functions.tokenizer import TokenizeClassifyStage
    from .stages.ocrstage import OCRStage
    from .stages.route import explode_spans
    from .stages.textstage import strip_boilerplate

    for fn in (
        explode_spans,
        strip_boilerplate,
        token_count_batch,
        quality_batch,
        lang_id_batch,
        fingerprint_batch,
    ):
        STEPS.setdefault(fn.__name__, fn)
    STEPS.setdefault("OCRStage", OCRStage)
    STEPS.setdefault("TokenizeClassifyStage", TokenizeClassifyStage)


_register_builtins()
