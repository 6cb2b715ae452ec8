"""Network-address analytics: IPv4 parsing and CIDR containment
joins — the access-log / geo-IP enrichment primitives a web-scale
corpus pipeline needs (attribute every request IP to its announcing
network before per-network rollups, abuse filtering, or geo joins).

The reference (a KML converter) has no network surface; this is a
§2.4-style extension. Everything is EXACT INTEGER bit arithmetic —
an IPv4 address is a 32-bit unsigned int carried in a BIGINT, a CIDR
is (base, prefix_len), and containment is a shift compare — so
results are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _pow2() -> Column:
    """2^0 .. 2^32 as a 1-indexed literal array (element k == 2^(k-1));
    used for column-valued shift widths (PySpark shiftleft/shiftright
    take only Python-int widths). Built lazily — Column literals need
    an active session."""
    return F.array(*[F.lit(1 << k).cast("long") for k in range(33)])


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 string → BIGINT in [0, 2³²), NULL for
    anything malformed (wrong part count, empty/non-digit parts,
    octets > 255, leading-plus/minus signs). Pure Column — codegen,
    no Python."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    ok = (F.size(parts) == 4)
    octs = []
    for i in range(4):
        p = F.try_element_at(parts, F.lit(i + 1))
        ok = ok & p.rlike(r"^[0-9]{1,3}$") & (p.cast("long") <= 255)
        octs.append(p.cast("long"))
    packed = (octs[0] * 16777216 + octs[1] * 65536
              + octs[2] * 256 + octs[3])
    return F.when(ok, packed).otherwise(F.lit(None))


def parse_cidr(col: Column | str) -> Column:
    """CIDR string ``a.b.c.d/p`` → struct(base BIGINT, plen INT),
    NULL for malformed input, un-aligned bases (host bits set below
    the prefix), or p outside [0, 32]."""
    c = F.col(col) if isinstance(col, str) else col
    halves = F.split(c, "/")
    base = ipv4_to_long(F.try_element_at(halves, F.lit(1)))
    plen_s = F.try_element_at(halves, F.lit(2))
    plen = F.when(plen_s.rlike(r"^[0-9]{1,2}$"),
                  plen_s.cast("int")).otherwise(F.lit(None))
    # host-bit (alignment) check: base & (2^(32-p) - 1) == 0; the
    # column-valued shift width comes from a 33-entry power-of-two
    # literal array (PySpark's shiftleft only takes a Python-int
    # width) — still pure integer codegen
    block = F.try_element_at(_pow2(), (33 - plen).cast("int"))
    host_mod = base.bitwiseAND(block - 1)
    ok = ((F.size(halves) == 2) & base.isNotNull() & plen.isNotNull()
          & (plen >= 0) & (plen <= 32) & (host_mod == 0))
    return F.when(ok, F.struct(base.alias("base"),
                               plen.alias("plen"))).otherwise(F.lit(None))


def cidr_contain_join(ips: DataFrame, networks: DataFrame, *,
                      ip_col: str, cidr_col: str,
                      bucket_bits: int = 16) -> DataFrame:
    """Join every IP row to every network whose CIDR block contains
    it — the log-enrichment workhorse (geo-IP, ASN attribution,
    allow/deny lists). Overlapping networks each match (emit-all;
    compose with a per-IP ``max(struct(plen, ...))`` for
    longest-prefix-wins).

    Scale shape — an EQUI-join, never a theta-join: both sides are
    keyed by the address's top ``bucket_bits`` bits. An IP lives in
    exactly ONE bucket; a network with ``plen >= bucket_bits`` lives
    in exactly one bucket too, and a rarer short-prefix network
    explodes to its 2^(bucket_bits − plen) covered buckets (bounded
    by 2^bucket_bits; ≤ 256 rows for a real-world /8 at the default
    /16 bucketing) — so matches are found by hash equi-join plus a
    shift-compare filter, no broadcast-nested-loop anywhere, and a
    given (ip, network) pair can only meet in one bucket (no dedup
    pass needed). Malformed IPs and CIDRs are dropped (parse → NULL
    → filtered); ``ip_col`` may also be a pre-parsed BIGINT column.

    Output: ips columns + (net_base, net_plen) + networks' other
    columns.
    """
    from pyspark.sql.types import LongType

    if not (0 <= int(bucket_bits) <= 24):
        raise ValueError(
            "cidr_contain_join: bucket_bits must be in [0, 24]")
    b = int(bucket_bits)
    ip_field = {f.name: f for f in ips.schema.fields}[ip_col]
    ip_num = (F.col(ip_col).cast("long")
              if isinstance(ip_field.dataType, LongType)
              else ipv4_to_long(ip_col))
    left = (ips.withColumn("_ip", ip_num)
            .where(F.col("_ip").isNotNull())
            .withColumn("_bkt", F.shiftright(F.col("_ip"), 32 - b)))

    net = (networks
           .withColumn("_cidr", parse_cidr(cidr_col))
           .where(F.col("_cidr").isNotNull())
           .select(*[c for c in networks.columns],
                   F.col("_cidr.base").alias("net_base"),
                   F.col("_cidr.plen").alias("net_plen")))
    # bucket fan-out: one row per covered /b bucket (0 extra rows for
    # plen >= b; 2^(b - plen) for the rare short prefixes)
    span = F.when(F.col("net_plen") >= b, F.lit(1).cast("long")) \
        .otherwise(F.try_element_at(
            _pow2(), (b - F.col("net_plen") + 1).cast("int")))
    first_bkt = F.shiftright(F.col("net_base"), 32 - b)
    net = (net.withColumn(
        "_bkt", F.explode(F.sequence(first_bkt,
                                     first_bkt + span - 1))))

    # exact containment: the base is aligned, so ip is inside the
    # block iff masking ip's host bits recovers the base:
    # ip & ~(2^(32-p) - 1) == base (plen == 0 masks everything to 0
    # == base, so the edge case needs no branch)
    blk = F.try_element_at(_pow2(), (33 - F.col("net_plen")).cast("int"))
    cond = (F.col("_ip").bitwiseAND(F.bitwise_not(blk - 1))
            == F.col("net_base"))
    out = (left.join(net, "_bkt").where(cond)
           .drop("_bkt", "_ip", "_cidr"))
    return out


def parse_url(df: DataFrame, *, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Structural URL decomposition as pure Columns — the web-corpus
    front door beside :func:`ipv4_to_long`/:func:`cidr_contain_join`:
    scheme, host, registrable-ish domain tail, path, query string and
    a lowercased host for grouping, all via anchored regexes over
    EXPLICIT character classes (letters/digits/explicit punctuation
    only — the :func:`~kml2geojson_spark.textops.script_mix_stats`
    rule, so Java regex and RE2/DuckDB agree symbol for symbol).

    Columns: ``scheme`` (before ``://``, lowercased), ``host``
    (authority up to the first ``/``, ``?``, ``#`` or ``:``,
    lowercased, credentials stripped at the last ``@``), ``port``
    (INT, NULL when absent), ``path`` (leading ``/...`` up to ``?`` /
    ``#``, ``""`` when absent), ``query`` (after ``?`` up to ``#``,
    ``""`` when absent), ``domain2`` (last two dot-labels of host —
    an approximation of the registrable domain that needs no suffix
    list; documented as such). Rows with NULL id/url or no
    ``scheme://host`` shape drop.

    Scale shape: scan-shaped, zero shuffle, zero Python — every
    extract inside whole-stage codegen.

    Output: (id, scheme, host, port, path, query, domain2).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.element_at(F.split(auth, "@"), -1)
    host = F.lower(F.element_at(F.split(hostport, ":"), 1))
    port = F.when(F.size(F.split(hostport, ":")) > 1,
                  F.element_at(F.split(hostport, ":"), 2).cast("int"))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    labels = F.split(host, r"\.")
    domain2 = F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    ).otherwise(host)
    return (df.where(F.col(id_col).isNotNull() & u.isNotNull())
            .select(F.col(id_col).alias("id"), scheme.alias("scheme"),
                    host.alias("host"), port.alias("port"),
                    path.alias("path"), query.alias("query"),
                    domain2.alias("domain2"))
            .where((F.col("scheme") != "") & (F.col("host") != "")))


_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonical_url_col(url) -> Column:
    """Canonical URL normalization as a pure Column — the URL-dedup
    key a crawl pipeline computes before :func:`exact-dedup
    <kml2geojson_spark.textops.exact_duplicates>` by URL: lowercase
    scheme and host, strip the fragment, drop the scheme's default
    port (:80/:443), collapse an empty path to "/" and strip a
    trailing slash elsewhere, remove utm_*/fbclid/gclid tracking
    params, and SORT the surviving query params (byte order — both
    engines sort ASCII identically). NULL for strings without
    "://" (not a absolute URL — no guessing).

    Everything is locate/substr/list arithmetic with single-pass
    evaluation — codegen, no regex backtracking, no Python; the
    oracle replay comes from :func:`canonical_url_sql`.
    """
    c = F.col(url) if isinstance(url, str) else url
    hash_pos = F.locate("#", c)
    defrag = F.when(hash_pos > 0, F.substring(c, 1, hash_pos - 1)) \
        .otherwise(c)
    sep = F.locate("://", defrag)
    scheme = F.lower(F.substring(defrag, 1, sep - 1))
    rest = F.substring(defrag, sep + 3, F.lit(1 << 20))
    slash = F.locate("/", rest)
    hostport = F.lower(
        F.when(slash > 0, F.substring(rest, 1, slash - 1))
        .otherwise(rest))
    pathq = F.when(slash > 0,
                   F.substring(rest, slash, F.lit(1 << 20))) \
        .otherwise(F.lit("/"))
    host = (F.when((scheme == "http") & hostport.endswith(":80"),
                   F.substring(hostport, 1,
                               F.length(hostport) - 3))
            .when((scheme == "https") & hostport.endswith(":443"),
                  F.substring(hostport, 1, F.length(hostport) - 4))
            .otherwise(hostport))
    qpos = F.locate("?", pathq)
    path = F.when(qpos > 0, F.substring(pathq, 1, qpos - 1)) \
        .otherwise(pathq)
    query = F.when(qpos > 0,
                   F.substring(pathq, qpos + 1, F.lit(1 << 20))) \
        .otherwise(F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when((F.length(path) > 1) & path.endswith("/"),
                  F.substring(path, 1, F.length(path) - 1)) \
        .otherwise(path)
    keepp = F.filter(
        F.split(query, "&"),
        lambda p: ((p != "")
                   & ~p.startswith(_TRACKING_PREFIXES[0])
                   & ~p.startswith(_TRACKING_PREFIXES[1])
                   & ~p.startswith(_TRACKING_PREFIXES[2])))
    qs = F.array_join(F.array_sort(keepp), "&")
    out = F.concat(scheme, F.lit("://"), host, path,
                   F.when(qs == "", F.lit(""))
                   .otherwise(F.concat(F.lit("?"), qs)))
    return F.when(sep > 0, out)


def canonical_url_sql(url_expr: str) -> str:
    """The DuckDB replay of :func:`canonical_url_col` — the same
    locate/substr/list pipeline, emitted as one expression."""
    c = f"({url_expr})"
    defrag = (f"(CASE WHEN strpos({c}, '#') > 0 THEN "
              f"substr({c}, 1, strpos({c}, '#') - 1) ELSE {c} END)")
    sep = f"strpos({defrag}, '://')"
    scheme = f"lower(substr({defrag}, 1, {sep} - 1))"
    rest = f"substr({defrag}, {sep} + 3)"
    slash = f"strpos({rest}, '/')"
    hostport = (f"lower(CASE WHEN {slash} > 0 THEN "
                f"substr({rest}, 1, {slash} - 1) ELSE {rest} END)")
    pathq = (f"(CASE WHEN {slash} > 0 THEN substr({rest}, {slash}) "
             f"ELSE '/' END)")
    host = (f"(CASE WHEN {scheme} = 'http' AND {hostport} LIKE '%:80'"
            f" THEN substr({hostport}, 1, length({hostport}) - 3)"
            f" WHEN {scheme} = 'https' AND {hostport} LIKE '%:443'"
            f" THEN substr({hostport}, 1, length({hostport}) - 4)"
            f" ELSE {hostport} END)")
    qpos = f"strpos({pathq}, '?')"
    path0 = (f"(CASE WHEN {qpos} > 0 THEN "
             f"substr({pathq}, 1, {qpos} - 1) ELSE {pathq} END)")
    query = (f"(CASE WHEN {qpos} > 0 THEN substr({pathq}, {qpos} + 1)"
             f" ELSE '' END)")
    path1 = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    path = (f"(CASE WHEN length({path1}) > 1 AND {path1} LIKE '%/'"
            f" THEN substr({path1}, 1, length({path1}) - 1)"
            f" ELSE {path1} END)")
    keepp = (f"list_filter(string_split({query}, '&'), "
             f"p -> p <> '' AND NOT starts_with(p, 'utm_') "
             f"AND NOT starts_with(p, 'fbclid=') "
             f"AND NOT starts_with(p, 'gclid='))")
    # DuckDB: array_to_string/list_sort of an EMPTY list yields NULL
    # (Spark's array_join gives '') — coalesce to keep the twins equal
    qs = f"COALESCE(array_to_string(list_sort({keepp}), '&'), '')"
    out = (f"({scheme} || '://' || {host} || {path} || "
           f"CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END)")
    return f"(CASE WHEN {sep} > 0 THEN {out} END)"
