"""IPv4/IPv6 CIDR adapter for the LPM engine — the reference's actual
domain (/root/reference/prototype/utils.py:53-56 encodes routes as
``(prefix_len << 32|128) + prefix``; ipfilter.py:26-27 ``NUMBITS =
{'v4': 32, 'v6': 128}``).

The PathLPM kernel is domain-agnostic (it hashes (prefix, depth) pairs),
so the adapter is a pure column-expression mapping: an address becomes a
per-bit '/'-joined path (``"1/0/0/..."``, 32 or 128 components) and a
CIDR route becomes the first ``prefix_len`` components at depth
``prefix_len``. Longest-prefix-match over bit-paths IS longest-prefix-
match over CIDRs. Everything stays JVM-side (split/transform/floor —
whole-stage codegen); no Python touches a row.

Golden behavior pinned from the reference's test suite
(/root/reference/prototype/tests.py_bak:309-349): 1.0.0.0 → /24 when
1.0.0.0/24 is in the table; 0.255.255.255 → 0 (default route, miss);
the 5-address traffic batch finds exactly 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

V4_BITS = 32
V6_BITS = 128


def ip4_from_dotted(ip_str_col):
    """'1.2.3.4' → uint32 as LongType (JVM-side)."""
    o = F.split(ip_str_col, r"\.")
    return (
        o[0].cast("long") * 16777216
        + o[1].cast("long") * 65536
        + o[2].cast("long") * 256
        + o[3].cast("long")
    )


def ip4_bits(ip_col, nbits=V4_BITS):
    """Array of the address's bits, most-significant first. Uses
    floor(ip / 2^k) % 2 — exact in double for ip < 2^53, so safe for v4;
    v6 uses nibble arithmetic instead (see ip6_bits)."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(nbits)),
        lambda i: (F.floor(ip_col / F.pow(F.lit(2.0), (F.lit(nbits) - i).cast("double"))).cast("long") % 2),
    )


def ip6_bits(hex_col):
    """Array of 128 bits from a 32-char lowercase hex string (the
    canonical fixed-width v6 form) — nibble-exact, no doubles."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda j: F.transform(
                F.sequence(F.lit(3), F.lit(0), F.lit(-1)),
                lambda b: (
                    F.floor(F.conv(F.substring(hex_col, j, 1), 16, 10).cast("long") / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2
                ),
            ),
        )
    )


def _bits_to_path(bits_col, depth=None):
    sl = bits_col if depth is None else F.slice(bits_col, 1, depth)
    return F.array_join(F.transform(sl, lambda b: b.cast("string")), "/")


def ip4_to_bitpath(ip_col):
    """uint32 (long col) → 32-component bit path '1/0/0/...'."""
    return _bits_to_path(ip4_bits(ip_col))


def ip6_to_bitpath(hex_col):
    return _bits_to_path(ip6_bits(hex_col))


def ip4_prefix_path(ip_col, plen_col):
    """(masked uint32, prefix_len) → bit path of the first plen bits —
    the PathLPM 'prefix' column for a CIDR route."""
    return _bits_to_path(ip4_bits(ip_col), plen_col)


def parse_cidr4(cidr_col):
    """'1.0.0.0/24' → struct(prefix_path, depth): the PathLPM route row."""
    ip = ip4_from_dotted(F.split(cidr_col, "/")[0])
    plen = F.split(cidr_col, "/")[1].cast("int")
    return F.struct(
        _bits_to_path(ip4_bits(ip), plen).alias("prefix"),
        plen.alias("depth"),
    )


def ip4_trunc(key_col, depth):
    """The IPv4 LPM domain's truncation: decimal-string key → masked
    decimal-string key at ``depth`` (int or Column). Plugs into
    ``PathLPM.build(trunc=...)`` / ``lookup(trunc=...)`` so v4 keys are
    three integer ops per depth instead of a 32-component bit-string
    build + split + rejoin (~10x less JVM work per probed row).
    pow(2, 32-d) is exact in double through 2^31, so the mask arithmetic
    is exact for all v4 depths."""
    d = depth if hasattr(depth, "cast") else F.lit(depth)
    ip = key_col.cast("long")
    p2 = F.pow(F.lit(2.0), (F.lit(V4_BITS) - d).cast("double")).cast("long")
    return (ip - (ip % p2)).cast("long").cast("string")


def cidr4_route_table(cidrs: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """CIDR-string table → PathLPM (prefix, depth) table in the numeric
    key domain: prefix = masked address as a decimal string."""
    ip = ip4_from_dotted(F.split(F.col(cidr_col), "/")[0])
    plen = F.split(F.col(cidr_col), "/")[1].cast("int")
    return cidrs.select(
        ip4_trunc(ip.cast("string"), plen).alias("prefix"), plen.alias("depth")
    ).distinct()


def cidr4_bitpath_table(cidrs: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """CIDR-string table → (prefix, depth) in the '/'-joined bit-path
    domain — the form ``exact_lpm`` (the path-domain oracle) consumes."""
    p = parse_cidr4(F.col(cidr_col))
    return cidrs.select(p["prefix"].alias("prefix"), p["depth"].alias("depth")).distinct()


def build_ip4_lpm(cidrs: DataFrame, cidr_col: str = "cidr", **build_kw):
    """Build a guided LPM engine over an IPv4 CIDR route table (numeric
    key domain — pair lookups with ``lookup_ip4``)."""
    from ip_filter_spark.operators.lpm import PathLPM

    return PathLPM.build(cidr4_route_table(cidrs, cidr_col), trunc=ip4_trunc, **build_kw)


def lookup_ip4(
    engine, traffic: DataFrame, ip_col: str = "ip", mode: str = "guided", exact_repair=None
) -> DataFrame:
    """LPM every uint32 address in ``traffic``: adds lpm_depth (matched
    prefix length, 0 = default route) and lpm_prefix_ip (the matched
    prefix's masked address as a long, null on miss). The engine must
    have been built in the numeric key domain (``build_ip4_lpm`` or
    ``PathLPM.build(trunc=ip4_trunc)``). ``exact_repair``: the numeric
    route table (``cidr4_route_table``) to close the FIB's 64-bit
    collision window exactly (see operators/lpm.py module docstring)."""
    out = engine.lookup(
        traffic, path_col=ip_col, mode=mode, trunc=ip4_trunc, exact_repair=exact_repair
    )
    return out.withColumn(
        "lpm_prefix_ip", F.when(F.col("lpm_depth") > 0, F.col("lpm_prefix").cast("long"))
    ).drop("lpm_prefix")


def format_ip4(ip_col):
    """uint32 long → dotted-quad string (for reports / parity checks)."""
    c = F.col(ip_col) if isinstance(ip_col, str) else ip_col
    octets = [
        F.floor(c / 16777216).cast("long"),
        (F.floor(c / 65536) % 256).cast("long"),
        (F.floor(c / 256) % 256).cast("long"),
        (c % 256).cast("long"),
    ]
    return F.concat_ws(".", *[o.cast("string") for o in octets])


def ip6_trunc(key_col, depth):
    """The IPv6 LPM domain's truncation: canonical 32-char lowercase hex
    key → masked, zero-padded 32-char hex key at ``depth`` (int or
    Column). Whole nibbles are kept with substr; the one partial nibble
    is masked via conv(hex→dec), integer mask, conv(dec→hex) — no
    128-element bit arrays anywhere (the bit-path form costs ~128
    transform ops per row; this is ~6 string/int ops)."""
    d = depth if hasattr(depth, "cast") else F.lit(depth)
    fullnib = F.floor(d / 4).cast("int")
    rem = (d % 4).cast("int")
    head = key_col.substr(F.lit(1), fullnib)
    nib = F.conv(key_col.substr(fullnib + F.lit(1), F.lit(1)), 16, 10).cast("long")
    keep = F.pow(F.lit(2.0), (F.lit(4) - rem).cast("double")).cast("long")
    # r6: dec->hex via native hex() (identical output for 0..15; the
    # hex->dec parse above stays conv, which accepts either case)
    nibhex = F.lower(F.hex(nib - (nib % keep)))
    return F.rpad(F.when(rem > 0, F.concat(head, nibhex)).otherwise(head), 32, "0")


def ip6_route_table(routes: DataFrame, hex_col: str = "h", plen_col: str = "depth") -> DataFrame:
    """(32-char hex, prefix_len) table → PathLPM (prefix, depth) in the
    masked-hex key domain."""
    return routes.select(
        ip6_trunc(F.col(hex_col), F.col(plen_col)).alias("prefix"),
        F.col(plen_col).cast("int").alias("depth"),
    ).distinct()


def build_ip6_lpm(routes: DataFrame, hex_col: str = "h", plen_col: str = "depth", **build_kw):
    """Guided LPM engine over IPv6 routes given as canonical 32-char
    lowercase hex + prefix length (masked-hex key domain; pair with
    ``lookup_ip6``)."""
    from ip_filter_spark.operators.lpm import PathLPM

    return PathLPM.build(ip6_route_table(routes, hex_col, plen_col), trunc=ip6_trunc, **build_kw)


def lookup_ip6(
    engine, traffic: DataFrame, hex_col: str = "h", mode: str = "guided", exact_repair=None
) -> DataFrame:
    """LPM every v6 address (canonical 32-char lowercase hex) in
    ``traffic``: adds lpm_depth and lpm_prefix_hex (masked 32-char hex of
    the matched prefix, null on miss). ``exact_repair``: the hex-domain
    route table (``ip6_route_table``) closes the FIB's 64-bit collision
    window exactly, same as the v4 and path domains."""
    out = engine.lookup(
        traffic, path_col=hex_col, mode=mode, trunc=ip6_trunc, exact_repair=exact_repair
    )
    return out.withColumnRenamed("lpm_prefix", "lpm_prefix_hex")
