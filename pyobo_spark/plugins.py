"""Nomenclature-plugin registry — the reference's entry-point dispatch
(``plugins.py:13-50``: ``has_nomenclature_plugin`` /
``run_nomenclature_plugin`` / ``iter_nomenclature_plugins`` over the
``ontology_resolver`` lookup dict of 54 bespoke converters).

Here a plugin is a callable ``(spark, **kwargs) -> dict[str, DataFrame]``
returning the engine's long tables; the registry maps normalized prefix
→ callable. The built-in registrations are the repo's source exemplars
(CSV / JSONL / GMT / XML / HGNC-envelope / special streams cover the
reference's converter idioms); ``register_nomenclature_plugin`` adds
more — the declarative specs mean a new converter is usually a spec +
one registration line, mirroring how the reference's entry points load
converter classes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

PluginFn = Callable[..., dict[str, DataFrame]]

_REGISTRY: dict[str, PluginFn] = {}


def register_nomenclature_plugin(prefix: str, fn: PluginFn) -> None:
    """Register a converter for a prefix (last registration wins, like
    overriding an entry point)."""
    _REGISTRY[prefix.lower()] = fn


def has_nomenclature_plugin(prefix: str) -> bool:
    """Reference plugins.py:26-35."""
    return prefix.lower() in _REGISTRY


def run_nomenclature_plugin(
    spark: SparkSession, prefix: str, **kwargs
) -> dict[str, DataFrame]:
    """Reference plugins.py:38-42 — run one converter. kwargs carry the
    source handle (e.g. ``path=``) since this sandbox performs no
    network retrieval (the reference's ensure_path download is oos)."""
    try:
        fn = _REGISTRY[prefix.lower()]
    except KeyError:
        raise KeyError(
            f"no nomenclature plugin for {prefix!r}; have "
            f"{sorted(_REGISTRY)}"
        ) from None
    return fn(spark, **kwargs)


def iter_nomenclature_plugins() -> Iterator[tuple[str, PluginFn]]:
    """Reference plugins.py:45-50 — sorted (prefix, converter) pairs."""
    yield from sorted(_REGISTRY.items())


def _register_builtins() -> None:
    from .sources.expasy_source import read_expasy
    from .sources.hgnc_source import read_hgnc_json
    from .sources.special_streams import read_cid_name, read_gene_info

    register_nomenclature_plugin("hgnc", read_hgnc_json)
    register_nomenclature_plugin(
        "eccode",
        lambda spark, path, **kw: read_expasy(spark, path, **kw),
    )
    register_nomenclature_plugin(
        "ncbigene",
        lambda spark, path: {"terms": _names_as_terms(read_gene_info(spark, path))},
    )
    register_nomenclature_plugin(
        "pubchem.compound",
        lambda spark, path: {"terms": _names_as_terms(read_cid_name(spark, path))},
    )


def _names_as_terms(names: DataFrame) -> DataFrame:
    """Lift a (prefix, identifier, name) special stream to the terms
    schema (these resources are pure nomenclatures — no definitions,
    hierarchy or obsolescence)."""
    from pyspark.sql import functions as F

    return names.select(
        "prefix",
        "identifier",
        "name",
        F.lit(None).cast("string").alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    )


_register_builtins()
