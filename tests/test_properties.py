"""Property-based tests (hypothesis) for the expression library and the
N-Triples round trip — the reference ships no property tests
(SURVEY §5); these pin the invariants the golden files can't cover.

Each hypothesis example is a BATCH (one Spark job over a generated
frame), so example counts stay low while value coverage stays high.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lp_etl_plugins_spark import model
from lp_etl_plugins_spark.functions.text import iri_encode, slugify


_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable unicode minus the NT line terminator troublemakers handled
# by escaping (which is exactly what the round trip must prove)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    min_size=0,
    max_size=40,
)
_iri = st.from_regex(r"urn:[a-zA-Z0-9/._-]{1,30}", fullmatch=True)
_lang = st.one_of(st.none(), st.sampled_from(["en", "cs", "de-AT"]))


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_iri, _iri, _text, _lang), min_size=1, max_size=25))
def test_ntriples_roundtrip(spark, tmp_path_factory, rows):
    """format → parse is the identity on literal triples, including
    quotes, backslashes, newlines, tabs and non-ASCII."""
    triples = spark.createDataFrame(
        [
            (s, p, o, "literal", lang, None if lang else "urn:dt/x")
            for (s, p, o, lang) in rows
        ],
        model.TRIPLES_SCHEMA,
    )
    path = str(tmp_path_factory.mktemp("nt_rt") / "out.nt")
    model.write_ntriples(triples, path, single_file=True)
    back = model.triples_from_ntriples(spark, path)
    # lang tags normalize to the RDF 1.1 lowercase value space on both
    # write and parse, so the fixed point is the lowercased tag
    def _key(t):
        # None-safe total order: None sorts before any string
        return tuple((v is not None, v) for v in t)

    want = sorted(
        (
            (s, p, o, t, None if lang is None else lang.lower(), dt)
            for (s, p, o, t, lang, dt) in map(tuple, triples.collect())
        ),
        key=_key,
    )
    got = sorted(map(tuple, back.collect()), key=_key)
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=30))
def test_slugify_charset_and_idempotence(spark, texts):
    """Reference parity invariants (DcatAp11ToCkanBatch.java:273-277):
    ASCII-only, no uppercase, no whitespace or dots (→ '-'), and
    slugify(slugify(x)) == slugify(x). Other Basic Latin punctuation
    (e.g. ':') passes through — the reference keeps it."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        slugify("t").alias("s1"),
        slugify(slugify("t")).alias("s2"),
    ).collect()
    for r in out:
        assert r["s1"] == r["s2"]
        # NFD strip: nothing outside basic latin survives
        assert r["s1"].isascii()
        assert not any(c.isupper() or c.isspace() or c == "." for c in r["s1"])


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=30))
def test_iri_encode_reversible_charset(spark, texts):
    """iri_encode output is URL-safe (no spaces, quotes, or control
    chars) and decodes back to the space→'-' form of the input."""
    from urllib.parse import unquote

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select("t", iri_encode("t").alias("e")).collect()
    for r in out:
        assert " " not in (r["e"] or "")
        assert unquote(r["e"]) == r["t"].replace(" ", "-")


@settings(**_SETTINGS)
@given(
    st.lists(
        st.decimals(
            min_value=-10_000_000, max_value=10_000_000, places=3, allow_nan=False
        ),
        min_size=1,
        max_size=30,
    )
)
def test_localized_number_parse(spark, values):
    """Czech-style formatted numbers (space grouping, comma decimal)
    parse back to their exact double value."""
    from lp_etl_plugins_spark.functions.numeric import parse_localized_number

    def fmt(d) -> str:
        s = f"{d:,.3f}"  # 1,234,567.890
        return s.replace(",", "G").replace(".", ",").replace("G", " ")

    df = spark.createDataFrame([(fmt(v), float(v)) for v in values], "raw string, want double")
    out = df.select(
        "want", parse_localized_number("raw", decimal_sep=",", group_sep=" ").alias("got")
    ).collect()
    for r in out:
        assert r["got"] == r["want"]


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), _text), min_size=1, max_size=25))
def test_char_ngrams_matches_python_reference(spark, texts):
    """char_ngrams == the one-line Python definition (distinct sliding
    3-grams of lower(trim(text)); empty set below n chars / for NULL)
    for arbitrary unicode, including chars the split-to-chars +
    shifted-slice construction could mishandle."""
    from lp_etl_plugins_spark.textops import char_ngrams

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["g"] for r in df.select("i", char_ngrams("t", 3).alias("g")).collect()}
    for i, t in enumerate(texts):
        if t is None:
            want = []
        else:
            # Spark/DuckDB trim() strips SPACES only — not \r/\t like
            # Python's str.strip() (Hypothesis caught the difference)
            low = t.strip(" ").lower()
            seen = set()
            want = []
            for j in range(len(low) - 2):
                g = low[j : j + 3]
                if g not in seen:
                    seen.add(g)
                    want.append(g)
        assert got[i] == want, (t, got[i], want)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_iri, _iri, _text, _lang), min_size=1, max_size=25))
def test_triples_repo_roundtrip_property(spark, tmp_path_factory, rows):
    """S7 repo sink: write → read is the identity on arbitrary literal
    triples (parquet carries raw strings — no escaping layer to trust)."""
    triples = spark.createDataFrame(
        [(s, p, o, "literal", lang, None) for (s, p, o, lang) in rows],
        model.TRIPLES_SCHEMA,
    )
    path = str(tmp_path_factory.mktemp("repo_rt") / "repo")
    model.write_triples_repo(triples, path, batch_statements=7)
    back = model.read_triples_repo(spark, path)

    def _key(t):
        return tuple((v is not None, v) for v in t)

    assert sorted(map(tuple, back.collect()), key=_key) == sorted(
        map(tuple, triples.collect()), key=_key
    )


@settings(**_SETTINGS)
@given(
    st.lists(  # left rows: (key, time)
        st.tuples(st.sampled_from("abc"), st.integers(0, 50)),
        min_size=1, max_size=20,
    ),
    st.lists(  # right rows: (key, time, rid)
        st.tuples(st.sampled_from("abc"), st.integers(0, 50), st.integers(0, 99)),
        min_size=0, max_size=20, unique_by=lambda r: r[2],
    ),
)
def test_asof_join_matches_reference(spark, lefts, rights):
    """The union-tag-sort carry-forward equals the quadratic reference
    on random inputs: per left row, the right row with the greatest
    (time <= left time), ties broken to the greatest rid."""
    from lp_etl_plugins_spark.util import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k string, lt long, lid long"
    )
    right = spark.createDataFrame(rights, "k string, rt long, rid long")

    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, key="k", left_time="lt", right_time="rt",
            payload=["rid"], tiebreak="rid",
        ).collect()
    }

    want = {}
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, rid) for (rk, rt, rid) in rights if rk == k and rt <= t]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(  # documents as word lists over a tiny vocab → chunk collisions
        st.lists(st.sampled_from(["alpha", "beta", "gamma"]), min_size=0, max_size=50),
        min_size=1,
        max_size=12,
    )
)
def test_chunk_dedup_matches_reference(spark, tmp_path_factory, word_lists):
    """t27's window plan equals a sequential keep-first reference:
    chunks are consecutive 20-word groups, first occurrence in global
    (doc_id, idx) order wins."""
    import math
    import re

    from lp_etl_plugins_spark.inventory.textops import t27_chunk_dedup

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    tmp = tmp_path_factory.mktemp("chunkdedup")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in t27_chunk_dedup(spark, str(tmp)).collect()
    }

    seen: set[str] = set()
    want = {}
    for doc_id, text in sorted(docs):
        ws = re.split(r"\s+", text.strip().lower())
        n = max(1, math.ceil(len(ws) / 20))
        chunks = [" ".join(ws[i * 20 : (i + 1) * 20]) for i in range(n)]
        kept = 0
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept += 1
        want[doc_id] = (n, kept)
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(  # random edge lists incl. self-loops and duplicates
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """BOTH regimes of connected_components equal a sequential
    union-find on random graphs: the default threshold routes these
    tiny graphs to the driver-side exact path (round 9), and
    ``small_graph_edges=0`` forces the distributed propagation loop —
    every node labeled with its component's minimum member id either
    way. The substrate under t10/t26/v9."""
    from lp_etl_plugins_spark.textops import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    got_dist = {
        r["id"]: r["cluster"]
        for r in connected_components(pairs, small_graph_edges=0).collect()
    }
    assert got_dist == got

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=30),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=20),
)
def test_pack_bins_matches_sequential_reference(spark, texts, capacity):
    """pack_bins equals a plain sequential fold: within each (group,
    shard), docs laid out in id order, each starting at the running
    token offset, bin = offset // capacity. The distributed window
    plan must reproduce the single-threaded reference exactly for any
    corpus and capacity (incl. empty/whitespace-only docs, which
    still produce one token under the shared splitter's semantics)."""
    import hashlib

    from lp_etl_plugins_spark.textops import pack_bins

    rows = [(i, t, "s%d" % (i % 2)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source, r.shard, r.id): (r.bin, r.toks, r.start_offset)
        for r in pack_bins(
            df, "text", "doc_id", "source", capacity=capacity, n_shards=3
        ).collect()
    }

    # sequential reference: same content-hash shard, same splitter
    # (Spark's split(trim(x), '\s+') on '' yields [''] — one token)
    def shard_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 3

    def toks_of(t):
        return len(t.strip().split()) if t.strip() else 1

    want = {}
    offsets: dict = {}
    for i, t, src in sorted(rows):
        sh = shard_of(i)
        off = offsets.get((src, sh), 0)
        want[(src, sh, i)] = (off // capacity, toks_of(t), off)
        offsets[(src, sh)] = off + toks_of(t)
    assert got == want


# -- SPARQL 1.1 MINUS vs NOT EXISTS: the full algebra split ------------

_term = st.sampled_from(["a", "b", "c", "d"])
_pred = st.sampled_from(["p", "q"])
_MINUS_PATTERNS = (
    [("?z", "p", "?w")],            # one shared var (z) — unbound-survives
    [("?x", "p", "?z")],            # two shared vars — per-row compatibility
    [("?u", "q", "?w")],            # disjoint domain — MINUS removes nothing
    [("?x", "q", "?x")],            # one shared var via a self-referential pattern
)


def _model_minus(base_rows, right_rows, shared):
    """SPARQL 1.1 §8.3 Minus(Ω1, Ω2) over plain dicts: drop μ1 iff some
    μ2 is compatible with it AND dom(μ1) ∩ dom(μ2) ≠ ∅ (None = unbound;
    BGP solutions are always fully bound, but the model stays general)."""
    out = []
    for b in base_rows:
        removed = False
        for r in right_rows:
            both = [v for v in shared if b[v] is not None and r[v] is not None]
            if both and all(b[v] == r[v] for v in both):
                removed = True
                break
        if not removed:
            out.append(b)
    return out


def _model_not_exists(base_rows, right_rows, shared):
    """The engine's FILTER NOT EXISTS: anti equi-join on the shared
    columns under SQL null semantics (NULL matches nothing); with no
    shared variables a non-empty block removes every base row."""
    if not shared:
        return [] if right_rows else list(base_rows)
    return [
        b
        for b in base_rows
        if not any(
            all(b[v] is not None and b[v] == r[v] for v in shared)
            for r in right_rows
        )
    ]


@settings(**_SETTINGS)
@given(
    triples=st.lists(st.tuples(_term, _pred, _term), min_size=0, max_size=12),
    base=st.lists(
        st.tuples(_term, st.one_of(st.none(), _term)), min_size=0, max_size=10
    ),
    pattern_ix=st.integers(min_value=0, max_value=len(_MINUS_PATTERNS) - 1),
)
def test_minus_vs_not_exists_algebra_property(spark, triples, base, pattern_ix):
    """Random BGPs against random solution sets (with genuinely unbound
    variables in the base) pin the full MINUS / NOT EXISTS split that
    g14's fixed query spot-checks: shared-unbound base rows survive
    MINUS, a disjoint-domain pattern removes nothing under MINUS but
    everything under a non-empty NOT EXISTS, and multi-shared-variable
    removal requires per-row compatibility with at least one bound
    overlap. Both operators are checked against pure-Python models of
    their algebra (multiset equality)."""
    from collections import Counter

    from lp_etl_plugins_spark import graphq as G

    patterns = _MINUS_PATTERNS[pattern_ix]
    tdf = spark.createDataFrame(
        [(s, p, o, "iri", None, None) for (s, p, o) in triples],
        model.TRIPLES_SCHEMA,
    )
    bdf = spark.createDataFrame(base, "x string, z string")
    base_rows = [{"x": x, "z": z} for (x, z) in base]
    right_df = G.bgp(tdf, patterns)
    rvars = sorted(G._plain_vars(right_df))
    right_rows = [dict(zip(rvars, r)) for r in right_df.select(*rvars).collect()]
    shared = sorted({"x", "z"} & set(rvars))

    got_minus = Counter(
        (r["x"], r["z"]) for r in G.minus(bdf, tdf, patterns).collect()
    )
    want_minus = Counter((b["x"], b["z"]) for b in _model_minus(base_rows, right_rows, shared))
    assert got_minus == want_minus

    got_ne = Counter(
        (r["x"], r["z"]) for r in G.not_exists(bdf, tdf, patterns).collect()
    )
    want_ne = Counter(
        (b["x"], b["z"]) for b in _model_not_exists(base_rows, right_rows, shared)
    )
    assert got_ne == want_ne

    # the split, stated directly:
    if not shared:
        assert got_minus == Counter((b["x"], b["z"]) for b in base_rows)
        if right_rows:
            assert got_ne == Counter()
    else:
        # every unbound-shared base row survives MINUS when z is the
        # only shared variable
        if shared == ["z"]:
            unbound = Counter((b["x"], b["z"]) for b in base_rows if b["z"] is None)
            surviving = Counter(
                (k for k, n in got_minus.items() if k[1] is None for _ in range(n))
            )
            assert surviving == Counter(k for k, n in unbound.items() for _ in range(n))
