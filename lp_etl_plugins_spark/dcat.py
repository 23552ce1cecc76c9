"""DCAT-AP v1.1 → CKAN extraction pipeline (``dcat_to_ckan``, SURVEY §3.2).

The reference (DcatAp11ToCkanBatch.java:156-625) runs ~25 correlated
SPARQL scalar/list lookups *per dataset* in a sequential loop. This
module inverts that into a set-oriented plan:

1. every property lookup becomes one branch of a union over the triples
   DataFrame — direct predicates, 2-hop paths (publisher/name,
   contactPoint/hasEmail, temporal/startDate) and the inverse path
   ``^foaf:primaryTopic/dcterms:source`` — producing ``(subject,
   prop, value)`` bindings;
2. ONE ``groupBy(subject).pivot(prop)`` aggregation turns bindings into
   a wide datasets (resp. distributions) DataFrame — a single shuffle
   for the whole catalog instead of N×25 queries;
3. the codelist label join (J6) broadcasts the bounded codelists graph;
4. JSON payloads assemble as ``to_json(struct(...))`` (null fields
   omitted — matching the reference's conditional ``put`` calls), with
   the resources array spliced in so preserved live resources keep
   their original raw JSON (J7's preservation leg,
   DcatAp11ToCkanBatch.java:504-507);
5. sinks: JSONL file (S8) and, separately, the REST upsert (S9) in
   :mod:`lp_etl_plugins_spark.catalog`.

Determinism contract (documented deviations): the reference's
"first query result wins" scalars (QueryResults.singleResult,
:627-641) become **min-by-value**, and multi-valued lists (keywords,
themes, resources) are sorted — the reference inherits RDF4J result
order, which is unspecified.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import fix_keyword, slugify
from .model import RDF_TYPE

DCAT = "http://www.w3.org/ns/dcat#"
DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
VCARD = "http://www.w3.org/2006/vcard/ns#"
SCHEMA = "http://schema.org/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
LODCZCKAN = "http://linked.opendata.cz/ontology/ckan/"

PROFILE_CKAN = "ckan"
PROFILE_NKOD = "nkod"


@dataclass(frozen=True)
class PropSpec:
    """One reference lookup (one ``executeSimpleSelectQuery`` call)."""

    name: str
    steps: tuple[str, ...]  # predicate chain; '^'-prefix = inverse hop
    lang: str | None = None  # 'LOAD' → the load language filter
    nkod_only: bool = False


# DcatAp11ToCkanBatch.java:254-404 — dataset-level lookups
_DATASET_PROPS: tuple[PropSpec, ...] = (
    PropSpec("dataset_id", (LODCZCKAN + "datasetID",)),
    PropSpec("organization_id", (LODCZCKAN + "organizationID",)),
    PropSpec("publisher_uri", (DCT + "publisher",)),
    PropSpec("publisher_name", (DCT + "publisher", FOAF + "name"), lang="LOAD"),
    PropSpec("title", (DCT + "title",), lang="LOAD"),
    PropSpec("description", (DCT + "description",), lang="LOAD"),
    PropSpec("contact_email", (DCAT + "contactPoint", VCARD + "hasEmail")),
    PropSpec("contact_name", (DCAT + "contactPoint", VCARD + "fn")),
    PropSpec("issued", (DCT + "issued",), nkod_only=True),
    PropSpec("modified", (DCT + "modified",), nkod_only=True),
    PropSpec("nkod_link", ("^" + FOAF + "primaryTopic", DCT + "source"), nkod_only=True),
    PropSpec("periodicity", (DCT + "accrualPeriodicity",), nkod_only=True),
    PropSpec("temporal_start", (DCT + "temporal", SCHEMA + "startDate"), nkod_only=True),
    PropSpec("temporal_end", (DCT + "temporal", SCHEMA + "endDate"), nkod_only=True),
    PropSpec("schema_url", (FOAF + "page",), nkod_only=True),
    PropSpec("spatial", (DCT + "spatial",), nkod_only=True),
)

# DcatAp11ToCkanBatch.java:413-499 — distribution-level lookups
_DISTRO_PROPS: tuple[PropSpec, ...] = (
    PropSpec("name", (DCT + "title",), lang="LOAD"),
    PropSpec("description", (DCT + "description",), lang="LOAD"),
    PropSpec("format_iri", (DCT + "format",)),
    PropSpec("download_url", (DCAT + "downloadURL",)),
    PropSpec("access_url", (DCAT + "accessURL",)),
    PropSpec("created", (DCT + "issued",)),
    PropSpec("last_modified", (DCT + "modified",)),
    PropSpec("temporal_start", (DCT + "temporal", SCHEMA + "startDate"), nkod_only=True),
    PropSpec("temporal_end", (DCT + "temporal", SCHEMA + "endDate"), nkod_only=True),
    PropSpec("dspatial", (DCT + "spatial",), nkod_only=True),
    PropSpec("described_by", (DCT + "conformsTo",), nkod_only=True),
    PropSpec("license_link", (DCT + "license",), nkod_only=True),
    PropSpec("media_type", (DCAT + "mediaType",), nkod_only=True),
)


def _col_or_null(df: DataFrame, name: str):
    """``F.col(name)`` when the pivot produced it, NULL otherwise —
    nkod-only properties are absent from the ckan-profile pivot, and a
    field builder referencing one directly would fail analysis."""
    return F.col(name) if name in df.columns else F.lit(None).cast("string")


def _binding_branch(tr: DataFrame, spec: PropSpec, lang: str) -> DataFrame:
    """One lookup → (s, prop, val) bindings. Paths become self-joins;
    the predicate filter prunes each side before the join."""
    first = spec.steps[0]
    if first.startswith("^"):
        cur = tr.filter(F.col("p") == first[1:]).select(
            F.col("o_value").alias("s"), F.col("s").alias("val")
        )
    else:
        cur = tr.filter(F.col("p") == first).select("s", F.col("o_value").alias("val"),
                                                    F.col("o_lang").alias("val_lang"))
    for step in spec.steps[1:]:
        nxt = tr.filter(F.col("p") == step).select(
            F.col("s").alias("mid"), F.col("o_value").alias("val2"),
            F.col("o_lang").alias("val2_lang")
        )
        cur = (
            cur.join(nxt, cur["val"] == nxt["mid"])
            .select("s", F.col("val2").alias("val"), F.col("val2_lang").alias("val_lang"))
        )
    if spec.lang is not None:
        want = lang if spec.lang == "LOAD" else spec.lang
        cur = cur.filter(F.lower(F.col("val_lang")) == want.lower())
    return cur.select("s", F.lit(spec.name).alias("prop"), "val")


def _pivot_props(
    tr: DataFrame, subjects: DataFrame, props: tuple[PropSpec, ...],
    lang: str, profile: str
) -> DataFrame:
    """Union of binding branches → one groupBy().pivot() — the single
    shuffle replacing the reference's N×25 correlated queries. Scalars
    resolve min-by-value (deterministic 'first')."""
    active = [p for p in props if profile == PROFILE_NKOD or not p.nkod_only]
    branches = [_binding_branch(tr, p, lang) for p in active]
    bindings = branches[0]
    for b in branches[1:]:
        bindings = bindings.unionByName(b)
    wide = (
        bindings.groupBy("s")
        .pivot("prop", [p.name for p in active])
        .agg(F.min("val"))
    )
    return subjects.join(wide, on="s", how="left")


def extract_datasets(
    spark: SparkSession, tr: DataFrame, lang: str = "cs", profile: str = PROFILE_NKOD
) -> DataFrame:
    """One row per dcat:Dataset with every dataset-level property the
    reference looks up, plus sorted keyword/theme aggregations.
    Datasets without a CKAN id are dropped (the reference warn-skips,
    DcatAp11ToCkanBatch.java:202-205)."""
    subjects = (
        tr.filter((F.col("p") == RDF_TYPE) & (F.col("o_value") == DCAT + "Dataset"))
        .select("s").distinct()
    )
    wide = _pivot_props(tr, subjects, _DATASET_PROPS, lang, profile)

    keywords = (
        tr.filter((F.col("p") == DCAT + "keyword") & (F.lower(F.col("o_lang")) == lang.lower()))
        .groupBy("s").agg(F.array_sort(F.collect_list("o_value")).alias("keywords"))
    )
    wide = wide.join(keywords, on="s", how="left")
    if profile == PROFILE_NKOD:
        themes = (
            tr.filter(F.col("p") == DCAT + "theme")
            .groupBy("s")
            .agg(F.array_sort(F.collect_list("o_value")).alias("themes"))
        )
        wide = wide.join(themes, on="s", how="left")
    return wide.withColumnRenamed("s", "dataset").filter(F.col("dataset_id").isNotNull())


def extract_distributions(
    spark: SparkSession,
    tr: DataFrame,
    codelists: DataFrame | None = None,
    lang: str = "cs",
    profile: str = PROFILE_NKOD,
) -> DataFrame:
    """One row per (dataset, distribution) with every distribution-level
    property; the format label resolves against the bounded codelists
    graph with a broadcast join (J6). Distributions with neither
    downloadURL nor accessURL are dropped
    (DcatAp11ToCkanBatch.java:434-444)."""
    edges = (
        tr.filter(F.col("p") == DCAT + "distribution")
        .select(F.col("s").alias("dataset"), F.col("o_value").alias("s"))
        .distinct()
    )
    wide = _pivot_props(tr, edges, _DISTRO_PROPS, lang, profile)
    wide = wide.withColumnRenamed("s", "distribution")
    # prefer downloadURL, fall back to accessURL, drop if both absent (P12)
    wide = wide.withColumn("url", F.coalesce("download_url", "access_url")).filter(
        F.col("url").isNotNull()
    )
    if codelists is not None:
        labels = (
            codelists.filter(
                (F.col("p") == SKOS + "prefLabel") & (F.lower(F.col("o_lang")) == "en")
            )
            .groupBy("s").agg(F.min("o_value").alias("format_label"))
            .withColumnRenamed("s", "format_iri")
        )
        wide = wide.join(F.broadcast(labels), on="format_iri", how="left")
    else:
        wide = wide.withColumn("format_label", F.lit(None).cast("string"))
    # mimetype: regex rewrite (P9, DcatAp11ToCkanBatch.java:497)
    if profile == PROFILE_NKOD:
        wide = wide.withColumn(
            "mimetype",
            F.when(
                F.col("media_type").isNotNull(),
                F.regexp_replace("media_type", r".*/([^/]+/[^/]+)", r"$1"),
            ),
        )
    return wide


def _distro_json(profile: str) -> Column:
    """One distribution resource → JSON string (the reference's per-distro
    JSONObject, DcatAp11ToCkanBatch.java:413-499). Null fields omitted."""
    fields = [
        F.col("name").alias("name"),
        F.col("description").alias("description"),
        F.col("format_label").alias("format"),
        F.col("url").alias("url"),
        F.col("distribution").alias("distro_url"),
        F.lit("file").alias("resource_type"),
        F.col("matched_id").alias("id"),
        F.col("created").alias("created"),
        F.col("last_modified").alias("last_modified"),
    ]
    if profile == PROFILE_NKOD:
        fields += [
            F.col("temporal_start").alias("temporal_start"),
            F.col("temporal_end").alias("temporal_end"),
            F.col("described_by").alias("describedBy"),
            F.col("license_link").alias("license_link"),
            F.col("mimetype").alias("mimetype"),
        ]
    return F.to_json(F.struct(*fields))


def merge_existing_resources(distros: DataFrame, existing: DataFrame | None) -> tuple[DataFrame, DataFrame | None]:
    """J7 diff/merge: match incoming distributions to live CKAN resources
    primarily by ``distro_url``, falling back to ``url``; matched ids are
    reused. Returns (distros + matched_id, preserved) where preserved
    are live resources claimed by no distribution — they are appended
    verbatim (DcatAp11ToCkanBatch.java:455-463,504-507).

    One join per match key on pre-filtered sides; the fallback join
    only sees rows the primary join missed. Each match key resolves to
    at most ONE live id (deterministic min) — several live resources
    sharing a key must not multiply the distribution into one payload
    row per copy; the unclaimed copies fall through to ``preserved``."""
    if existing is None:
        return distros.withColumn("matched_id", F.lit(None).cast("string")), None
    by_distro = (
        existing.filter(F.col("distro_url").isNotNull())
        .groupBy(
            F.col("dataset").alias("m1_ds"), F.col("distro_url").alias("m1_key")
        )
        .agg(F.min("id").alias("m1_id"))
    )
    by_url = (
        existing.groupBy(F.col("dataset").alias("m2_ds"), F.col("url").alias("m2_key"))
        .agg(F.min("id").alias("m2_id"))
    )
    step1 = distros.join(
        by_distro,
        (distros["dataset"] == F.col("m1_ds")) & (distros["distribution"] == F.col("m1_key")),
        "left",
    ).drop("m1_ds", "m1_key")
    step2 = step1.join(
        by_url,
        (step1["dataset"] == F.col("m2_ds")) & (step1["url"] == F.col("m2_key"))
        & step1["m1_id"].isNull(),
        "left",
    ).drop("m2_ds", "m2_key")
    merged = step2.withColumn("matched_id", F.coalesce("m1_id", "m2_id")).drop("m1_id", "m2_id")
    claimed = merged.filter(F.col("matched_id").isNotNull()).select(
        F.col("dataset").alias("c_dataset"), F.col("matched_id").alias("c_id")
    ).distinct()
    preserved = existing.join(
        claimed,
        (existing["dataset"] == claimed["c_dataset"]) & (existing["id"] == claimed["c_id"]),
        "left_anti",
    )
    return merged, preserved


def build_payloads(
    datasets: DataFrame,
    distros: DataFrame,
    organizations: DataFrame | None = None,
    existing: DataFrame | None = None,
    profile: str = PROFILE_NKOD,
) -> DataFrame:
    """Assemble one CKAN dataset JSON per row → (dataset, dataset_id,
    payload). The resources array is spliced into the to_json output so
    preserved live resources contribute their original raw JSON."""
    merged, preserved = merge_existing_resources(distros, existing)
    res = merged.withColumn("res_json", _distro_json(profile)).select(
        "dataset", "distribution", "res_json", "dspatial" if profile == PROFILE_NKOD else F.lit(None).alias("dspatial")
    )
    if preserved is not None:
        res = res.unionByName(
            preserved.select(
                "dataset",
                # preserved resources sort after generated ones, by id
                F.concat(F.lit("zzz-preserved/"), F.col("id")).alias("distribution"),
                F.col("raw_json").alias("res_json"),
                F.lit(None).cast("string").alias("dspatial"),
            )
        )
    per_ds = res.groupBy("dataset").agg(
        F.concat_ws(
            ",", F.transform(F.array_sort(F.collect_list(F.struct("distribution", "res_json"))), lambda x: x["res_json"])
        ).alias("resources_body"),
        F.min("dspatial").alias("distro_spatial"),
    )
    out = datasets.join(per_ds, on="dataset", how="left")

    if organizations is not None:
        orgs = organizations.select(
            F.col("publisher_uri").alias("o_uri"), F.col("org_name").alias("looked_up_org")
        )
        out = out.join(F.broadcast(orgs), out["publisher_uri"] == orgs["o_uri"], "left").drop("o_uri")
    else:
        out = out.withColumn("looked_up_org", F.lit(None).cast("string"))
    out = out.withColumn("owner_org", F.coalesce("organization_id", "looked_up_org"))

    tags = F.coalesce(
        F.transform(
            F.filter(
                F.transform(F.col("keywords"), fix_keyword),
                lambda k: F.length(k) >= 2,
            ),
            lambda k: F.struct(k.alias("name")),
        ),
        F.array().cast("array<struct<name:string>>"),
    )
    fields = [
        tags.alias("tags"),
        F.col("dataset_id").alias("name"),
        F.col("title").alias("title"),
        F.col("description").alias("notes"),
        F.col("contact_email").alias("maintainer_email"),
        F.col("contact_name").alias("maintainer"),
        F.col("owner_org").alias("owner_org"),
    ]
    if profile == PROFILE_NKOD:
        # the reference overwrites root.spatial_uri from the distribution
        # loop when a distribution carries dcterms:spatial (:474-478)
        themes_concat = F.when(
            F.col("themes").isNotNull() & (F.size("themes") > 0),
            F.concat(F.array_join("themes", " "), F.lit(" ")),  # trailing space parity (:399-401)
        )
        fields += [
            F.col("publisher_uri").alias("publisher_uri"),
            F.col("publisher_name").alias("publisher_name"),
            F.col("issued").alias("real_issued"),
            F.col("modified").alias("real_modified"),
            F.col("nkod_link").alias("nkod_link"),
            F.col("periodicity").alias("frequency"),
            F.col("temporal_start").alias("temporal_start"),
            F.col("temporal_end").alias("temporal_end"),
            F.col("schema_url").alias("schema"),
            F.coalesce(F.col("distro_spatial"), F.col("spatial")).alias("spatial_uri"),
            themes_concat.alias("theme"),
        ]
    body = F.to_json(F.struct(*fields))
    resources_arr = F.concat(
        F.lit('"resources":['), F.coalesce(F.col("resources_body"), F.lit("")), F.lit("]")
    )
    payload = F.concat(
        F.expr("substring(body, 1, length(body) - 1)"), F.lit(","), resources_arr, F.lit("}")
    )
    return (
        out.withColumn("body", body)
        .withColumn("payload", payload)
        .select("dataset", "dataset_id", "payload")
    )


def organization_payloads(datasets: DataFrame) -> DataFrame:
    """Organizations that would need creating (the reference auto-creates
    them per dataset, DcatAp11ToCkanBatch.java:264-319): publisher name
    slugified NFD → ascii kebab (the engine's one pandas UDF)."""
    pubs = datasets.filter(
        F.col("organization_id").isNull() & F.col("publisher_uri").isNotNull()
    ).select("publisher_uri", "publisher_name").distinct()
    return pubs.select(
        "publisher_uri",
        F.col("publisher_name").alias("title"),
        slugify(F.col("publisher_name")).alias("name"),
    )


def write_jsonl(payloads: DataFrame, path: str, single_file: bool = True) -> None:
    """S8 JSONL sink — one JSON object per dataset per line
    (DcatAp11ToCkanBatch.java:179-188,569-571). Sorted by dataset id so
    the file is byte-deterministic."""
    lines = payloads.orderBy("dataset_id").select(F.col("payload").alias("value"))
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


_RUIAN_RE = r"http://ruian\.linked\.opendata\.cz/resource/([^/]+)/(.*)"


def _ruian_type(spatial: Column) -> Column:
    """RÚIAN IRI type → DKAN code (P10 recode,
    DcatAp11ToDkanBatch.java:383-404); non-RÚIAN → 'ST'."""
    t = F.regexp_replace(spatial, _RUIAN_RE, r"$1")
    return (
        F.when(t == "vusc", "VC")
        .when(t == "obce", "OB")
        .when(t == "kraje", "KR")
        .when(t == "orp", "OP")
        .when(t == "momc", "MC")
        .when(t == "pou", "PU")
        .otherwise("ST")
    )


def build_dkan_fields(
    datasets: DataFrame,
    distributions: DataFrame,
    groups: DataFrame | None = None,
    profile: str = PROFILE_NKOD,
) -> DataFrame:
    """§2.8 ``dcat_to_dkan``: the same extraction core encoded as Drupal
    form fields (DcatAp11ToDkanBatch.java:296-520). Returns one row per
    node to post: (dataset, kind 'dataset'|'resource', node_key,
    form_json) — form_json keys are the FINAL Drupal field names
    (``body[und][0][value]`` etc.), ready for
    :func:`lp_etl_plugins_spark.catalog.dkan_post_nodes`.

    Mandatory-field defaults mirror the reference: missing description →
    title (:321-324), frequency → UNKNOWN (:355-362), license →
    unknown-licence (:505-510), mimetype → octet-stream (:511-516),
    non-RÚIAN/absent spatial → type ST code 1 (:378-426)."""
    ds = datasets
    if groups is not None:
        g = groups.select(
            F.col("publisher_uri").alias("g_uri"), F.col("group_id").alias("group_id")
        )
        ds = ds.join(F.broadcast(g), ds["publisher_uri"] == g["g_uri"], "left").drop("g_uri")
    else:
        ds = ds.withColumn("group_id", F.lit(None).cast("string"))

    # ""kw"" -space-joined tag string (DcatAp11ToDkanBatch.java:304-310;
    # sorted for determinism)
    tags_concat = F.array_join(
        F.transform(
            F.filter(F.transform(F.col("keywords"), fix_keyword), lambda k: F.length(k) >= 2),
            lambda k: F.concat(F.lit('""'), k, F.lit('"" ')),
        ),
        "",
    )
    fields = [
        F.lit("dataset").alias("type"),
        F.when(tags_concat != "", tags_concat).alias("field_tags[und][value_field]"),
        F.col("title").alias("title"),
        F.coalesce(
            F.col("description"),
            F.col("title") if profile == PROFILE_NKOD else F.lit(None),
        ).alias("body[und][0][value]"),
        _col_or_null(ds, "issued").alias("created"),
        _col_or_null(ds, "modified").alias("changed"),
        F.col("group_id").alias("og_group_ref[und][target_id]"),
    ]
    if profile == PROFILE_NKOD:
        spatial_known = F.col("spatial").isNotNull() & F.col("spatial").rlike(_RUIAN_RE)
        themes_concat = F.when(
            F.col("themes").isNotNull() & (F.size("themes") > 0),
            F.concat(F.array_join("themes", " "), F.lit(" ")),
        )
        fields += [
            F.col("contact_email").alias("field_maintainer_email[und][0][value]"),
            F.col("contact_name").alias("field_maintainer[und][0][value]"),
            F.col("publisher_uri").alias("field_publisher_uri[und][0][value]"),
            F.col("publisher_name").alias("field_publisher_name[und][0][value]"),
            F.coalesce(
                F.col("periodicity"),
                F.lit("http://publications.europa.eu/resource/authority/frequency/UNKNOWN"),
            ).alias("field_frequency_ods[und][0][value]"),
            F.col("temporal_start").alias("field_temporal_start[und][0][value]"),
            F.col("temporal_end").alias("field_temporal_end[und][0][value]"),
            F.col("schema_url").alias("field_schema[und][0][value]"),
            F.col("spatial").alias("field_spatial[und][0][value]"),
            F.when(spatial_known, _ruian_type(F.col("spatial")))
            .otherwise(F.lit("ST"))
            .alias("field_ruian_type[und][0][value]"),
            F.when(spatial_known, F.regexp_replace("spatial", _RUIAN_RE, r"$2"))
            .otherwise(F.lit("1"))
            .alias("field_ruian_code[und][0][value]"),
            themes_concat.alias("field_theme[und][0][value]"),
        ]
    ds_nodes = ds.select(
        "dataset",
        F.lit("dataset").alias("kind"),
        F.col("dataset_id").alias("node_key"),
        F.to_json(F.struct(*fields)).alias("form_json"),
    )

    di = distributions.join(
        datasets.select("dataset", F.col("title").alias("ds_title")), on="dataset", how="left"
    )
    dfields = [
        F.lit("resource").alias("type"),
        # distribution title is mandatory in DKAN (:311-315)
        F.coalesce(F.col("name"), F.col("ds_title"), F.lit("Resource")).alias("title"),
        F.col("description").alias("body[und][0][value]"),
        F.when(
            _col_or_null(di, "media_type").isNotNull(),
            F.regexp_replace(
                _col_or_null(di, "media_type"), r".*/([^/]+/[^/]+)", r"$1"
            ),
        ).alias("field_link_remote_file[und][0][filemime]"),
        F.col("url").alias("field_link_remote_file[und][0][filefield_remotefile][url]"),
        F.col("created").alias("created"),
        F.col("last_modified").alias("changed"),
    ]
    if profile == PROFILE_NKOD:
        dfields += [
            F.col("temporal_start").alias("field_temporal_start[und][0][value]"),
            F.col("temporal_end").alias("field_temporal_end[und][0][value]"),
            F.col("described_by").alias("field_described_by[und][0][value]"),
            F.coalesce(
                F.col("license_link"),
                F.lit("http://joinup.ec.europa.eu/category/licence/unknown-licence"),
            ).alias("field_licence[und][0][value]"),
            F.regexp_replace(
                F.coalesce(
                    F.col("media_type"),
                    F.lit("http://www.iana.org/assignments/media-types/application/octet-stream"),
                ),
                r".*/([^/]+/[^/]+)",
                r"$1",
            ).alias("field_mimetype[und][0][value]"),
        ]
    distro_nodes = di.select(
        "dataset",
        F.lit("resource").alias("kind"),
        F.col("distribution").alias("node_key"),
        F.to_json(F.struct(*dfields)).alias("form_json"),
    )
    return ds_nodes.unionByName(distro_nodes)


def dcat_to_dkan(
    spark: SparkSession,
    metadata: DataFrame,
    groups: DataFrame | None = None,
    lang: str = "cs",
    profile: str = PROFILE_NKOD,
) -> DataFrame:
    """§2.8 component op: metadata graph → DKAN form-field node rows
    (same extraction core as dcat_to_ckan, different encoder/sink)."""
    datasets = extract_datasets(spark, metadata, lang=lang, profile=profile)
    distros = extract_distributions(spark, metadata, None, lang=lang, profile=profile)
    return build_dkan_fields(datasets, distros, groups, profile=profile)


def dcat_to_ckan(
    spark: SparkSession,
    metadata: DataFrame,
    codelists: DataFrame | None = None,
    organizations: DataFrame | None = None,
    existing: DataFrame | None = None,
    lang: str = "cs",
    profile: str = PROFILE_NKOD,
) -> DataFrame:
    """§2.8 component op: metadata graph (+ codelists graph, + live
    catalog state) → CKAN JSON payload per dataset."""
    datasets = extract_datasets(spark, metadata, lang=lang, profile=profile)
    distros = extract_distributions(spark, metadata, codelists, lang=lang, profile=profile)
    return build_payloads(datasets, distros, organizations, existing, profile=profile)
