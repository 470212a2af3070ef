"""Training-data text operators: dedup (exact, MinHash+LSH, SimHash,
n-gram Jaccard), language-ID, quality scoring, winnowing fingerprints.

Engine-added (nothing text-shaped exists in the reference); these are the
document-pipeline counterparts the 100-TB engine needs alongside the
geospatial core.  Every operator is expressed as ONE dialect-templated SQL
string: the Spark query runs the ``spark`` rendering (pure built-in
higher-order array functions — whole-stage codegen, no Python), the DuckDB
correctness oracle runs the ``duck`` rendering, so both engines execute the
same algorithm by construction.

Hashes are md5→bigint (deterministic, identical across engines; see
``oracle.hash60``) — never engine-native hash functions.

Scale notes: MinHash/SimHash/fingerprints are per-row map work (no
shuffle); the LSH candidate join shuffles on (band, band_key) — bounded
bucket sizes by construction; pair dedup via ``a.doc_id < b.doc_id``.
"""

from __future__ import annotations

from ..oracle import hash60

K_MINHASH = 16
LSH_BANDS = 4  # 4 bands × 4 rows
# minimum matching signature components for a band-join pair to count as a
# duplicate EDGE in the clustering stage (half the signature)
CLUSTER_MATCH_T = 8
SIMHASH_BITS = 16
SHINGLE_N = 3
WINNOW_K = 8   # char k-grams
WINNOW_W = 4   # winnowing window

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "de", "y", "una"),
}


# ------------------------------------------------------- dialect helpers ---


def _d(dialect: str) -> dict:
    if dialect == "spark":
        return dict(
            T="transform", FILT="filter", MIN="array_min", SIZE="size",
            DIST="array_distinct", SUML="aggregate({x}, CAST(0 AS BIGINT), (acc, v) -> acc + v)",
            STR="STRING", EXPL="explode",
        )
    return dict(
        T="list_transform", FILT="list_filter", MIN="list_min", SIZE="len",
        DIST="list_distinct",
        # CAST: DuckDB list_sum returns HUGEINT, which fetchdf() materializes
        # as float64 — the driver's value hash then sees 8.0 vs Spark's 8
        # (the r4 dedup_minhash/dedup_simhash reds).  BIGINT keeps int64.
        SUML="CAST(list_sum({x}) AS BIGINT)", STR="VARCHAR",
        EXPL="unnest",
    )


def _regex_count(text: str, pat: str, dialect: str) -> str:
    """Non-overlapping match count of a BACKSLASH-FREE regex (patterns
    here use [.] / [0-9] instead of \\. / \\d so the literal needs no
    escaping in either dialect: Spark treats backslash as a string
    escape, DuckDB does not)."""
    if dialect == "spark":
        return f"regexp_count({text}, '{pat}')"
    return f"len(regexp_extract_all({text}, '{pat}'))"


# PII patterns — deliberately backslash-free (see _regex_count); both
# engines use leftmost non-overlapping semantics for these constructs
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE = "[+][0-9][0-9 ()-]{7,}[0-9]"
PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
DECON_MIN_SHARED = 1  # any shared fingerprint flags a doc


def _seq(a, b, dialect: str) -> str:
    """Integer list [a..b] inclusive.

    CAUTION: for b < a Spark's ``sequence`` yields a DESCENDING range while
    DuckDB's ``range`` yields an empty list — callers must guarantee b ≥ a
    (the query templates filter short documents up front)."""
    if dialect == "spark":
        return f"sequence({a}, {b})"
    return f"range({a}, ({b}) + 1)"


def _slice(x, start, n, dialect: str) -> str:
    """n elements of x from 1-based position ``start``."""
    if dialect == "spark":
        return f"slice({x}, {start}, {n})"
    return f"list_slice({x}, {start}, ({start}) + ({n}) - 1)"


def _get(x, i, dialect: str) -> str:
    """1-based element access."""
    return f"element_at({x}, {i})" if dialect == "spark" else f"({x})[{i}]"


def _join_str(x, sep, dialect: str) -> str:
    return (f"array_join({x}, '{sep}')" if dialect == "spark"
            else f"array_to_string({x}, '{sep}')")


def tokens(text: str, dialect: str) -> str:
    return f"split({text}, ' ')" if dialect == "spark" else f"string_split({text}, ' ')"


def _h60_of(expr: str, salt: str, dialect: str) -> str:
    return hash60(f"'{salt}:' || {expr}", dialect)


# ------------------------------------------------------------- operators ---


def shingles_sql(toks: str, dialect: str, n: int = SHINGLE_N) -> str:
    """Token n-gram strings (empty list for docs shorter than n tokens)."""
    D = _d(dialect)
    seq = _seq("0", f"{D['SIZE']}({toks}) - {n}", dialect)
    gram = _join_str(_slice(toks, "i + 1", n, dialect), " ", dialect)
    return f"{D['T']}({seq}, i -> {gram})"


def minhash_sql(sh: str, dialect: str, k: int = K_MINHASH) -> str:
    """k-component MinHash signature (array<bigint>) of a shingle list.

    One md5 digest carries 128 bits, so components 2h and 2h+1 both come
    from digest h via non-overlapping 60-bit hex chunks (chars 1-15 and
    17-31) — HALVING the md5 count, the dominant cost of the signature
    stage.  The per-(doc, h) digest list is bound once through a
    single-element-array transform so the two chunk minima share it
    (lambda variables bind evaluated values in both engines, not
    re-expanded expressions)."""
    if k % 2 != 0:  # not assert: python -O would silently yield k-1 components
        raise ValueError(f"paired-chunk minhash needs an even k (got {k})")
    D = _d(dialect)
    s = D["STR"]
    digests = f"{D['T']}({sh}, s -> md5('mh:' || CAST(h AS {s}) || ':' || s))"
    if dialect == "spark":
        c1 = "CAST(conv(substr(d, 1, 15), 16, 10) AS BIGINT)"
        c2 = "CAST(conv(substr(d, 17, 15), 16, 10) AS BIGINT)"
        pair = (f"element_at(transform(array({digests}), ds -> "
                f"array({D['MIN']}({D['T']}(ds, d -> {c1})), "
                f"{D['MIN']}({D['T']}(ds, d -> {c2})))), 1)")
    else:
        c1 = "CAST(('0x' || substring(d, 1, 15)) AS BIGINT)"
        c2 = "CAST(('0x' || substring(d, 17, 15)) AS BIGINT)"
        pair = (f"(list_transform([{digests}], ds -> "
                f"[{D['MIN']}({D['T']}(ds, d -> {c1})), "
                f"{D['MIN']}({D['T']}(ds, d -> {c2}))]))[1]")
    return f"flatten({D['T']}({_seq('0', str(k // 2 - 1), dialect)}, h -> {pair}))"


def band_keys_sql(sig: str, dialect: str,
                  bands: int = LSH_BANDS, k: int = K_MINHASH) -> str:
    """LSH band keys: md5 of each (k/bands)-row slice of the signature."""
    D = _d(dialect)
    rows = k // bands
    sl = _slice(sig, f"b * {rows} + 1", rows, dialect)
    cast = f"{D['T']}({sl}, v -> CAST(v AS {D['STR']}))"
    return (f"{D['T']}({_seq('0', str(bands - 1), dialect)}, "
            f"b -> md5({_join_str(cast, '|', dialect)}))")


def sig_match_sql(sa: str, sb: str, dialect: str, k: int = K_MINHASH) -> str:
    """Number of equal components between two signatures."""
    D = _d(dialect)
    eq = f"CASE WHEN {_get(sa, 'i', dialect)} = {_get(sb, 'i', dialect)} THEN 1 ELSE 0 END"
    lst = f"{D['T']}({_seq('1', str(k), dialect)}, i -> CAST({eq} AS BIGINT))"
    return D["SUML"].format(x=lst)


def simhash_sql(toks: str, dialect: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash: bit b set iff sum over tokens of ±1 (by bit b of the token
    hash) is ≥ 0.  Packed into a BIGINT.

    Bit extraction uses integer shift operators in both dialects — never
    floating division (Spark truncates double→int casts, DuckDB rounds)."""
    D = _d(dialect)
    th = _h60_of("t", "simhash", dialect)
    if dialect == "spark":
        bit_b = f"(shiftright({th}, b) & 1)"
        pow_b = "shiftleft(CAST(1 AS BIGINT), b)"
    else:
        bit_b = f"(({th} >> b) & 1)"
        pow_b = "(CAST(1 AS BIGINT) << b)"
    pm = f"CASE WHEN {bit_b} = 1 THEN 1 ELSE -1 END"
    tot = D["SUML"].format(x=f"{D['T']}({toks}, t -> CAST({pm} AS BIGINT))")
    bit = f"CASE WHEN {tot} >= 0 THEN {pow_b} ELSE CAST(0 AS BIGINT) END"
    lst = f"{D['T']}({_seq('0', str(bits - 1), dialect)}, b -> {bit})"
    return D["SUML"].format(x=lst)


def jaccard_sql(sha: str, shb: str, dialect: str) -> str:
    """Exact Jaccard of DISTINCT shingle sets ×1e6 (BIGINT)."""
    D = _d(dialect)
    if dialect == "spark":
        inter = f"size(array_intersect({sha}, {shb}))"
        union = f"size(array_union({sha}, {shb}))"
    else:
        inter = f"len(list_intersect({sha}, {shb}))"
        union = (f"(len(list_distinct({sha})) + len(list_distinct({shb})) "
                 f"- len(list_intersect({sha}, {shb})))")
    return (f"CAST(round(CAST({inter} AS DOUBLE) / "
            f"(CASE WHEN {union} = 0 THEN 1 ELSE {union} END) * 1e6, 0) AS BIGINT)")


def containment_sql(sha: str, shb: str, dialect: str) -> str:
    """Asymmetric containment |A∩B| / |A| of DISTINCT shingle sets ×1e6
    (BIGINT) — the corpus-curation metric for "does doc A's content
    appear inside doc B" (catches quote-inclusion and super-document
    duplication that symmetric Jaccard under-scores)."""
    if dialect == "spark":
        inter = f"size(array_intersect({sha}, {shb}))"
        na = f"size(array_distinct({sha}))"
    else:
        inter = f"len(list_intersect({sha}, {shb}))"
        na = f"len(list_distinct({sha}))"
    return (f"CAST(round(CAST({inter} AS DOUBLE) / "
            f"(CASE WHEN {na} = 0 THEN 1 ELSE {na} END) * 1e6, 0) AS BIGINT)")


def stopword_score_sql(toks: str, lang: str, dialect: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    D = _d(dialect)
    if dialect == "spark":
        cond = f"array_contains(array({words}), t)"
    else:
        cond = f"list_contains([{words}], t)"
    return f"{D['SIZE']}({D['FILT']}({toks}, t -> {cond}))"


def winnow_sql(text: str, dialect: str, k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """Winnowing fingerprints: char k-gram hashes → per-window minima →
    distinct list (standard MOSS-style document fingerprint).

    Precondition: length(text) ≥ k + w (callers filter; Spark's ``sequence``
    would otherwise produce a DESCENDING range instead of an empty list)."""
    D = _d(dialect)
    size = D["SIZE"]
    gram = f"substring({text}, i + 1, {k})"
    seq_h = _seq("0", f"length({text}) - {k}", dialect)
    hashes = f"{D['T']}({seq_h}, i -> {_h60_of(gram, 'fp', dialect)})"
    ph = "__HLIST__"
    win_min = f"{D['MIN']}({_slice(ph, 'i + 1', w, dialect)})"
    seq_w = _seq("0", f"{size}({ph}) - {w}", dialect)
    wins = f"{D['T']}({seq_w}, i -> {win_min})"
    return f"{D['DIST']}({wins})".replace(ph, f"({hashes})")


# -------------------------------------------------------- query templates ---


def base_mut_sql(dialect: str) -> tuple[str, str]:
    """The shared (base, mut) document CTE bodies: length/token-guarded
    docs plus a synthesized first-token-dropped mutation of every 5th doc
    (``mut`` references the ``base`` CTE).  ONE generator feeds the
    minhash signature stage, the jaccard query, AND the clustering stage,
    so the dedup suite's document universe cannot drift between queries."""
    instr = "instr(text, ' ')" if dialect == "spark" else "strpos(text, ' ')"
    ntok = ("size(split(text, ' '))" if dialect == "spark"
            else "len(string_split(text, ' '))")
    # token-count guard: a >=48-char doc can still have <3 tokens (URLs,
    # CJK); Spark's sequence(0, negative) is DESCENDING and slice(…, 0, …)
    # throws — filter identically in both dialects instead
    base = ("SELECT doc_id, text FROM documents "
            f"WHERE text IS NOT NULL AND length(text) >= 48 AND {ntok} >= 4")
    mut = (f"SELECT doc_id + 10000000 AS doc_id, substring(text, {instr} + 1) AS text "
           f"FROM base WHERE doc_id % 5 = 0")
    return base, mut


def all_docs_len_sql(dialect: str) -> str:
    """doc universe (base ∪ mut) with character lengths — the node table +
    canonicalization weight for the clustering stage."""
    base, mut = base_mut_sql(dialect)
    return (f"WITH base AS ({base}), mut AS ({mut}) "
            f"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars "
            f"FROM (SELECT * FROM base UNION ALL SELECT * FROM mut)")


def minhash_split_sql(dialect: str) -> tuple[str, str]:
    """(sig_stage_sql, pairs_sql_with_VIEW_placeholder) — the Spark engine
    materializes the signature stage (cache + temp view) before the
    band-join, avoiding 6× recomputation of the md5 minhash under Spark's
    CTE inlining.  ``pairs`` references the relation ``__SIG__``."""
    toks = tokens("text", dialect)
    sh = shingles_sql(toks, dialect)
    base, mut = base_mut_sql(dialect)
    sig_stage = f"""
WITH base AS ({base}),
mut AS ({mut}),
all_docs AS (SELECT * FROM base UNION ALL SELECT * FROM mut)
SELECT doc_id, {minhash_sql(sh, dialect)} AS sig
FROM all_docs"""
    # band keys derive from the (materialized) signature — the expensive
    # shingle→minhash work happens exactly once per doc
    keys = band_keys_sql("sig", dialect)
    if dialect == "spark":
        # in-task posexplode: ONE scan of the signature view and ONE keys
        # evaluation (4 md5) per doc.  The 4-branch UNION ALL the oracle
        # keeps below scans __SIG__ once per branch and re-evaluates all
        # 4 band keys in each (16 md5/doc); the oracle text must stay
        # byte-identical, so only the spark rendering changes — the row
        # set is the same (posexplode's 0-based pos == the literal
        # band_idx).
        bandrows = ("SELECT doc_id, band_idx, band_key FROM keyed "
                    "LATERAL VIEW posexplode(keys) AS band_idx, band_key")
    else:
        bandrows = f"""
  SELECT doc_id, 0 AS band_idx, {_get('keys', 1, dialect)} AS band_key FROM keyed
  UNION ALL SELECT doc_id, 1, {_get('keys', 2, dialect)} FROM keyed
  UNION ALL SELECT doc_id, 2, {_get('keys', 3, dialect)} FROM keyed
  UNION ALL SELECT doc_id, 3, {_get('keys', 4, dialect)} FROM keyed"""
    pairs = f"""
WITH keyed AS (SELECT doc_id, {keys} AS keys FROM __SIG__),
bandrows AS ({bandrows}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandrows a JOIN bandrows b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id)
SELECT p.doc_a, p.doc_b, {sig_match_sql('x.sig', 'y.sig', dialect)} AS n_match
FROM pairs p
JOIN __SIG__ x ON x.doc_id = p.doc_a
JOIN __SIG__ y ON y.doc_id = p.doc_b"""
    return sig_stage, pairs


FUNNEL_DR_MIN = 330_000  # distinct-token ratio ×1e6 below which = low_quality


def funnel_from_scored_sql(dialect: str, lead_with: str = "WITH ") -> str:
    """The corpus-funnel verdict SQL given a ``scored`` relation
    (doc_a, doc_b, n_match) already in scope: gate precedence pii →
    duplicate (greedy keep-smaller-id side of the scored pairs) →
    low_quality (distinct-token ratio) → keep, over the base ∪ mut
    document universe.  ``lead_with=''`` continues an existing WITH
    list (the oracle); the engine passes a temp-view-backed ``scored``
    and the default ``WITH``."""
    D = _d(dialect)
    st = D["STR"]
    toks = tokens("text", dialect)
    dr = quality_features_sql("text", toks, dialect)["distinct_ratio_e6"]
    pii_t = (
        f"CASE WHEN doc_id % 7 = 0 THEN text || ' contact user'"
        f" || CAST(doc_id AS {st}) || '@example.com' ELSE text END"
    )
    n_pii = _regex_count("ptext", PII_EMAIL, dialect)
    base_sql, mut_sql = base_mut_sql(dialect)
    return f"""{lead_with}
dup AS (SELECT DISTINCT doc_b AS doc_id FROM scored
        WHERE n_match >= {CLUSTER_MATCH_T}),
base AS ({base_sql}),
m AS ({mut_sql}),
uni AS (SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM m),
feat AS (SELECT doc_id, {pii_t} AS ptext, {dr} AS dr FROM uni),
v AS (SELECT feat.doc_id,
        CASE WHEN {n_pii} > 0 THEN 'pii'
             WHEN dup.doc_id IS NOT NULL THEN 'duplicate'
             WHEN dr < {FUNNEL_DR_MIN} THEN 'low_quality'
             ELSE 'keep' END AS verdict
      FROM feat LEFT JOIN dup ON feat.doc_id = dup.doc_id)
SELECT doc_id, verdict FROM v"""


def text_queries_sql(dialect: str) -> dict[str, str]:
    """The text/dedup queries, rendered for one dialect.

    The Spark engine executes the ``spark`` rendering over a ``documents``
    temp view; the DuckDB oracle executes the ``duck`` rendering over the
    pre-registered ``documents`` view — same algorithm by construction.
    Near-dup pairs are made non-degenerate by synthesizing a mutated copy
    (first token dropped) of every 5th document inside the query itself.
    """
    toks = tokens("text", dialect)
    sh = shingles_sql(toks, dialect)
    dsh = _d(dialect)["DIST"] + f"({sh})"
    base, mut = base_mut_sql(dialect)

    # single-statement form (DuckDB oracle; the Spark engine materializes
    # the sig stage instead — see minhash_split_sql)
    sig_stage, pairs = minhash_split_sql(dialect)
    minhash_pairs = (
        f"WITH sig AS ({sig_stage.strip()}) "
        + pairs.replace("WITH keyed", ", keyed", 1).replace("__SIG__", "sig").lstrip()
    )

    simhash = f"""
WITH base AS ({base})
SELECT doc_id, {simhash_sql(toks, dialect)} AS simhash FROM base"""

    jaccard = f"""
WITH base AS ({base}),
mut AS ({mut})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {jaccard_sql(dsh.replace('text', 'a.text'), dsh.replace('text', 'b.text'), dialect)} AS jac_e6
FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
UNION ALL
SELECT a.doc_id AS doc_a, m.doc_id AS doc_b,
       {jaccard_sql(dsh.replace('text', 'a.text'), dsh.replace('text', 'm.text'), dialect)} AS jac_e6
FROM base a JOIN mut m ON m.doc_id = a.doc_id + 10000000"""

    # Same pairing scheme as jaccard; the mutated copy CONTAINS all but
    # the first token of its source, so base→mut containment scores near
    # 1e6 while the unrelated consecutive-id pairs stay low — both arms
    # meaningfully exercised.
    containment = f"""
WITH base AS ({base}),
mut AS ({mut})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {containment_sql(dsh.replace('text', 'a.text'), dsh.replace('text', 'b.text'), dialect)} AS cont_e6
FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
UNION ALL
SELECT m.doc_id AS doc_a, a.doc_id AS doc_b,
       {containment_sql(dsh.replace('text', 'm.text'), dsh.replace('text', 'a.text'), dialect)} AS cont_e6
FROM base a JOIN mut m ON m.doc_id = a.doc_id + 10000000"""

    scores = {lg: stopword_score_sql("toks", lg, dialect) for lg in STOPWORDS}
    pred = (f"CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
            f"WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
            f"WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END")
    langid = f"""
WITH base AS (SELECT doc_id, lang, {toks} AS toks FROM documents
              WHERE text IS NOT NULL AND length(text) >= 48),
scored AS (SELECT doc_id, lang, {scores['en']} AS s_en, {scores['de']} AS s_de,
                  {scores['fr']} AS s_fr, {scores['es']} AS s_es FROM base)
SELECT lang, {pred} AS predicted, count(*) AS n
FROM scored GROUP BY 1, 2"""

    feats = quality_features_sql("text", toks, dialect)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in feats.items())
    quality = f"WITH base AS ({base}) SELECT doc_id, {cols} FROM base"

    fps = winnow_sql("text", dialect)
    D = _d(dialect)
    fingerprint = f"""
WITH base AS ({base}),
fp AS (SELECT doc_id, {fps} AS fps FROM base)
SELECT doc_id, CAST({D['SIZE']}(fps) AS BIGINT) AS n_fp,
       {D['MIN']}(fps) AS min_fp
FROM fp"""

    # Decontamination: treat the mutated copies as a LEAKED EVAL SET and
    # find which corpus docs share winnowing fingerprints with it — the
    # training-pipeline "did the benchmark leak into the corpus?" check.
    # Equi-join on the 60-bit fingerprint hash (never text×text); per-doc
    # fingerprint lists are already distinct and the eval list is
    # distinct'd, so plain counts are exact overlap cardinalities.
    # The fingerprints here are NOT the winnow_sql list expression: an
    # explode over that list re-evaluates the whole per-doc gram-hash
    # list once PER EMITTED ROW (measured: 180 s vs 2 s at sf0.001).
    # Instead explode the gram POSITIONS first (one md5 per gram row),
    # take window minima over an ordered frame, then distinct — the
    # identical winnowing semantics (k-gram hashes → per-window minima →
    # distinct), and the formulation that scales: the shuffle moves
    # (doc_id, i, hash) triples, never text or hash lists.
    expl = D["EXPL"]
    k, w = WINNOW_K, WINNOW_W

    def fp_cte(src: str, tag: str) -> str:
        seq = _seq("0", f"length(text) - {k}", dialect)
        gram = f"substring(text, i + 1, {k})"
        return f"""
g{tag} AS (SELECT doc_id, text, {expl}({seq}) AS i FROM {src}),
h{tag} AS (SELECT doc_id, i, length(text) AS ln,
                  {_h60_of(gram, 'fp', dialect)} AS h FROM g{tag}),
w{tag} AS (SELECT doc_id, i, ln,
                  min(h) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                    AS fp
           FROM h{tag}),
fp{tag} AS (SELECT DISTINCT doc_id, fp FROM w{tag}
            WHERE i <= ln - {k} + 1 - {w})"""

    decontam = f"""
WITH base AS ({base}),
mut AS ({mut}),{fp_cte('base', 'b')},{fp_cte('mut', 'e0')},
fpe AS (SELECT DISTINCT fp FROM fpe0),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fpb GROUP BY doc_id),
hits AS (SELECT fpb.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         FROM fpb JOIN fpe ON fpb.fp = fpe.fp GROUP BY fpb.doc_id)
SELECT h.doc_id, h.n_shared, nf.n_fp
FROM hits h JOIN nf ON h.doc_id = nf.doc_id
WHERE h.n_shared >= {DECON_MIN_SHARED}"""

    # PII scan: counts of email/phone/IPv4-shaped spans per document.
    # Every 7th doc gets synthetic PII appended INSIDE the query (the
    # base_mut trick) so true positives exist and zero-count rows verify
    # the absence of false positives.
    st = D["STR"]
    pii_text = (
        f"CASE WHEN doc_id % 7 = 0 THEN text || ' contact user'"
        f" || CAST(doc_id AS {st}) || '@example.com or +1 555 010 '"
        f" || CAST(doc_id % 10000 AS {st}) || ' at 10.0.'"
        f" || CAST(doc_id % 256 AS {st}) || '.25' ELSE text END"
    )
    pii = f"""
WITH base AS ({base}),
aug AS (SELECT doc_id, {pii_text} AS text FROM base)
SELECT doc_id,
       CAST({_regex_count('text', PII_EMAIL, dialect)} AS BIGINT) AS n_email,
       CAST({_regex_count('text', PII_PHONE, dialect)} AS BIGINT) AS n_phone,
       CAST({_regex_count('text', PII_IPV4, dialect)} AS BIGINT) AS n_ipv4
FROM aug"""

    # Corpus-curation funnel: every document (base ∪ the synthesized
    # mutated copies, the dedup universe) gets ONE verdict by explicit
    # gate precedence — the end-to-end training-data filter this suite's
    # pieces exist for.  All gates are exact-integer comparisons over
    # shared texts, and the duplicate rule is the greedy keep-smaller-id
    # side of the scored MinHash pairs (every flagged doc has a kept
    # near-duplicate with a smaller id).
    # single-statement assembly for the oracle: same split the
    # dedup-clusters oracle uses.  The SPARK engine does NOT run this
    # rendering — __spark_entry__ substitutes the materialized signature
    # checkpoint via funnel_from_scored_sql (CTE inlining would recompute
    # the shingle→minhash stage 3×; measured ~5 min vs seconds at sf0.1).
    body = (pairs.replace("WITH keyed", ", keyed", 1)
            .replace("__SIG__", "sig"))
    cte_part, final_select = body.split("SELECT p.doc_a", 1)
    scored_sql = "SELECT p.doc_a" + final_select
    funnel = (f"WITH sig AS ({sig_stage.strip()}){cte_part},\n"
              f"scored AS ({scored_sql}),"
              + funnel_from_scored_sql(dialect, lead_with=""))

    return {
        "dedup_minhash": minhash_pairs,
        "dedup_simhash": simhash,
        "dedup_jaccard": jaccard,
        "dedup_containment": containment,
        "lang_id": langid,
        "doc_quality": quality,
        "doc_fingerprint": fingerprint,
        "decontaminate": decontam,
        "pii_scan": pii,
        "corpus_funnel": funnel,
    }


def quality_features_sql(text: str, toks: str, dialect: str) -> dict[str, str]:
    """Quantized per-doc quality features (all integers → exact parity)."""
    D = _d(dialect)
    n_tok = f"{D['SIZE']}({toks})"
    n_chars = f"length({text})"
    distinct_ratio = (f"CAST(round(CAST({D['SIZE']}({D['DIST']}({toks})) AS DOUBLE) / "
                      f"(CASE WHEN {n_tok} = 0 THEN 1 ELSE {n_tok} END) * 1e6, 0) AS BIGINT)")
    mean_tok_len = (f"CAST(round(CAST({n_chars} AS DOUBLE) / "
                    f"(CASE WHEN {n_tok} = 0 THEN 1 ELSE {n_tok} END) * 1e3, 0) AS BIGINT)")
    stop_ratio = (f"CAST(round(CAST({stopword_score_sql(toks, 'en', dialect)} AS DOUBLE) / "
                  f"(CASE WHEN {n_tok} = 0 THEN 1 ELSE {n_tok} END) * 1e6, 0) AS BIGINT)")
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "distinct_ratio_e6": distinct_ratio,
        "mean_tok_len_e3": mean_tok_len,
        "stopword_ratio_e6": stop_ratio,
    }


def top_terms(docs, k: int = 3, doc_id: str = "doc_id", text: str = "text"):
    """TF-IDF top-``k`` terms per document (DataFrame operator).

    Ranking is INTEGER-deterministic — (tf DESC, df ASC, term ASC): most
    frequent in the doc, rarest in the corpus, lexicographic tie-break —
    so the cross-engine rank can never flip on a float near-tie; the
    reported score tf·ln(N/df) is output-only (quantized by callers).

    Plan shape: explode → (doc, term) count (map-side combined — the big
    exchange) → term-keyed doc-frequency of the MUCH smaller tf table →
    equi-join back on term → per-doc top-k via WindowGroupLimit.  N
    arrives as a broadcast 1-row aggregate, not a driver collect().
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = docs.filter(F.col(text).isNotNull())
    toks = d.select(
        doc_id, F.explode(F.split(F.col(text), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(doc_id, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_total"))
    w = Window.partitionBy(doc_id).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    ranked = (
        tf.join(df_, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(n))
    )
    return ranked.select(
        doc_id,
        "rank",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.log(F.col("n_total").cast("double") / F.col("df")))
        .alias("tfidf"),
    )
