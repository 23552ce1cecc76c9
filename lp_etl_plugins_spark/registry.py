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
    """Run named stages in order; each stage's keyword arguments resolve
    from the accumulated context first, then from its literal dict.
    Stage outputs merge back into the context under
    ``<stage>.<output>`` plus the plain output name (latest wins)."""
    ctx = dict(context or {})
    for name, kwargs in stages:
        comp = get(name)
        resolved = {k: ctx.get(v, v) if isinstance(v, str) else v for k, v in kwargs.items()}
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

    from . import catalog, cube, dcat

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
    )
    for comp in builtins:
        if comp.name not in _REGISTRY:
            _REGISTRY[comp.name] = comp
    _BUILTINS_LOADED = True
