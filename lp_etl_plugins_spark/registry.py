"""Component registry — the engine's public extension point.

LP-ETL users see *components* wired by ports (definition.jsonld:12-56);
the engine's equivalent is a registry of named pipeline stages. A stage
is any callable ``(spark, **inputs) -> output`` where inputs/outputs
are DataFrames or plain values; :func:`pipeline` composes stages by
feeding each stage's output dict forward. Registration is open — host
applications add their own transforms next to the built-in §2.8
components.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Component:
    name: str
    fn: Callable
    description: str
    inputs: tuple[str, ...] = ()
    outputs: tuple[str, ...] = ("result",)


@dataclass(frozen=True)
class Ref:
    """Explicit context reference for :func:`pipeline` kwargs — the
    programmatic form of the ``"$key"`` string syntax."""

    key: str


_REGISTRY: dict[str, Component] = {}


def register(
    name: str,
    description: str,
    inputs: tuple[str, ...] = (),
    outputs: tuple[str, ...] = ("result",),
) -> Callable[[Callable], Callable]:
    """Decorator: add a stage to the registry under ``name``."""

    def deco(fn: Callable) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"component {name!r} already registered")
        _REGISTRY[name] = Component(name, fn, description, inputs, outputs)
        return fn

    return deco


def get(name: str) -> Component:
    _ensure_builtins()
    return _REGISTRY[name]


def components() -> dict[str, Component]:
    _ensure_builtins()
    return dict(_REGISTRY)


def pipeline(spark, stages: list[tuple[str, dict]], context: dict | None = None) -> dict:
    """Run named stages in order. Context references are EXPLICIT: a
    kwarg value of ``Ref("key")`` or the string ``"$key"`` resolves to
    the accumulated context entry (and raises if it is not bound);
    every other value — including plain strings — passes through as a
    literal (``"$$"`` escapes a literal leading dollar). The earlier
    context-FIRST resolution silently rewrote user literals that
    happened to collide with a live context key (e.g. an ``out_path``
    equal to ``"corpus"``). Stage outputs merge back into the context
    under ``<stage>.<output>`` plus the plain output name (latest
    wins)."""

    def resolve(stage: str, v):
        if isinstance(v, Ref):
            key = v.key
        elif isinstance(v, str) and v.startswith("$") and not v.startswith("$$"):
            key = v[1:]
        elif isinstance(v, str) and v.startswith("$$"):
            return v[1:]
        else:
            return v
        if key not in ctx:
            raise KeyError(
                f"pipeline stage {stage!r}: context key {key!r} is not bound "
                f"(available: {sorted(k for k in ctx if '.' not in k)})"
            )
        return ctx[key]

    ctx = dict(context or {})
    for name, kwargs in stages:
        comp = get(name)
        resolved = {k: resolve(name, v) for k, v in kwargs.items()}
        out = comp.fn(spark, **resolved)
        outs = out if isinstance(out, dict) else {comp.outputs[0]: out}
        for k, v in outs.items():
            ctx[f"{name}.{k}"] = v
            ctx[k] = v
    return ctx


_BUILTINS_LOADED = False


def _ensure_builtins() -> None:
    """Register the §2.8 component surface lazily (import cycles).

    Each builtin is guarded PER NAME: a component a host registered
    first is never overwritten, and one pre-registered name doesn't
    make the others silently vanish. The loaded flag is only latched
    after success, so a transient import failure is retried (and
    surfaces as its real error, not a later bare KeyError)."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return

    from . import catalog, cube, dcat, maintenance

    builtins = (
        Component(
            "fdp_to_cube", cube.fdp_to_cube,
            "FDP descriptor + CSV → RDF Data Cube triples (t-fdpToRdf)",
            ("descriptor", "csv_paths"), ("triples",),
        ),
        Component(
            "dcat_to_ckan", dcat.dcat_to_ckan,
            "DCAT-AP graph → CKAN dataset JSON payloads (l-dcatAp11ToCkanBatch)",
            ("metadata", "codelists"), ("payloads",),
        ),
        Component(
            "dcat_to_dkan", dcat.dcat_to_dkan,
            "DCAT-AP graph → DKAN form-field nodes (l-dcatAp11ToDkanBatch)",
            ("metadata",), ("nodes",),
        ),
        Component(
            "ckan_purge", catalog.ckan_purge,
            "Enumerate CKAN datasets (API or CSV) and bulk purge (x-ckanPurger)",
            ("api_uri", "api_key"), ("results",),
        ),
        Component(
            "dkan_purge", catalog.dkan_purge,
            "Paginated DKAN node enumeration and bulk delete (x-dkanPurger)",
            ("api_uri", "api_key"), ("results",),
        ),
        # extension surface: the nightly maintenance sweep as a
        # pipeline stage, so a scheduled pipeline run is one component
        # invocation returning the report frame
        Component(
            "vacuum", maintenance.vacuum,
            "Integrity probes + threshold compaction across every "
            "persisted index-state family (maintenance.vacuum)",
            ("paths",), ("report",),
        ),
    )
    for comp in builtins:
        if comp.name not in _REGISTRY:
            _REGISTRY[comp.name] = comp
    _BUILTINS_LOADED = True
