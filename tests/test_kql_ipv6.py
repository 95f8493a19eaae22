"""Round-13 IPv6 family — differential fuzz against the Python
``ipaddress`` module (a genuinely foreign parser/masker) plus pinned
edge cases. Covers parse_ipv6 / parse_ipv6_mask / ipv6_compare /
ipv6_is_match / ipv6_is_in_range / ipv6_is_in_any_range and the
round-13 ipv4 additions (ipv4_is_private, ipv4_is_in_any_range).

The engine accepts compressed IPv6, exploded IPv6, mixed case,
embedded trailing IPv4 (x::a.b.c.d), pure IPv4 (mapped to
::ffff:a.b.c.d, '/p' -> /(96+p)), and '/NN' prefixes — every shape the
generator below produces is first validated by ``ipaddress`` so both
sides agree on what the input MEANS; structural garbage is pinned to
null separately."""

import ipaddress
import random

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _mask128(n: int, p: int) -> int:
    keep = 128 - p
    return (n >> keep) << keep if keep > 0 else n


def _exploded(n: int) -> str:
    return ":".join(f"{(n >> (112 - 16 * k)) & 0xFFFF:04x}" for k in range(8))


def _py_parse(s: str):
    """(masked 128-bit int, effective prefix) via ipaddress, or None."""
    addr, _, suf = s.partition("/")
    p = int(suf) if suf else None
    try:
        ip = ipaddress.ip_address(addr)
    except ValueError:
        return None
    if ip.version == 4:
        n = (0xFFFF << 32) | int(ip)
        pfx = 128 if p is None else 96 + p
    else:
        n = int(ip)
        pfx = 128 if p is None else p
    if not 0 <= pfx <= 128:
        return None
    return _mask128(n, pfx), pfx


def _render(rng: random.Random):
    """A random valid address string + its parsed meaning."""
    kind = rng.randrange(5)
    if kind == 0:  # random 128-bit, compressed
        n = rng.getrandbits(128)
        s = str(ipaddress.IPv6Address(n))
    elif kind == 1:  # random, exploded, maybe uppercase
        n = rng.getrandbits(128)
        s = ipaddress.IPv6Address(n).exploded
        if rng.random() < 0.5:
            s = s.upper()
    elif kind == 2:  # sparse (lots of zero groups -> '::' compression)
        n = 0
        for _ in range(rng.randrange(1, 4)):
            n |= rng.getrandbits(16) << (16 * rng.randrange(8))
        s = str(ipaddress.IPv6Address(n))
    elif kind == 3:  # v4-mapped (renders with a dotted tail)
        n = (0xFFFF << 32) | rng.getrandbits(32)
        s = str(ipaddress.IPv6Address(n))
    else:  # pure IPv4
        s = str(ipaddress.IPv4Address(rng.getrandbits(32)))
    if rng.random() < 0.4:
        maxp = 32 if "." in s and ":" not in s else 128
        s = f"{s}/{rng.randrange(0, maxp + 1)}"
    return s


def test_ipv6_fuzz_vs_ipaddress(spark):
    rng = random.Random(1306)
    cases = [( _render(rng), _render(rng), rng.randrange(0, 129))
             for _ in range(80)]
    df = spark.createDataFrame(
        [(i, a, b, p) for i, (a, b, p) in enumerate(cases)],
        "i int, a string, b string, p int",
    )
    out = kql_to_df(
        {"T": df},
        "T | extend pa = parse_ipv6(a), pm = parse_ipv6_mask(a, p),"
        " c2 = ipv6_compare(a, b), c3 = ipv6_compare(a, b, p),"
        " m2 = ipv6_is_match(a, b), m3 = ipv6_is_match(a, b, p),"
        " ir = ipv6_is_in_range(a, b)"
        " | project i, pa, pm, c2, c3, m2, m3, ir",
    ).collect()
    got = {r["i"]: r for r in out}
    for i, (a, b, p) in enumerate(cases):
        pa, pb = _py_parse(a), _py_parse(b)
        r = got[i]
        # parse_ipv6: exploded form masked to the address's own prefix
        assert r["pa"] == (None if pa is None else _exploded(pa[0])), (a,)
        # parse_ipv6_mask: least(own prefix, p)
        if pa is None:
            assert r["pm"] is None, (a, p)
        else:
            na, _ = _py_parse(a.partition("/")[0])
            want = _exploded(_mask128(na, min(pa[1], p)))
            assert r["pm"] == want, (a, p)
        for col, extra in (("c2", None), ("c3", p)):
            mcol = "m2" if col == "c2" else "m3"
            if pa is None or pb is None:
                assert r[col] is None, (a, b, col)
                assert r[mcol] is None, (a, b, mcol)
                continue
            pp = min(pa[1], pb[1]) if extra is None else min(
                pa[1], pb[1], extra)
            ka, kb = _mask128(pa[0], pp), _mask128(pb[0], pp)
            want = -1 if ka < kb else (1 if ka > kb else 0)
            assert r[col] == want, (a, b, col, pp)
            assert r[mcol] == (want == 0), (a, b, mcol)
        # is_in_range: the RAW ip masked at the RANGE's prefix (the
        # ip's own '/suffix' is ignored, like the ipv4 family)
        if pa is None or pb is None:
            assert r["ir"] is None, (a, b)
        else:
            raw_a = _py_parse(a.partition("/")[0])[0]
            assert r["ir"] == (_mask128(raw_a, pb[1]) == pb[0]), (a, b)


def _one(spark, expr):
    df = spark.createDataFrame([(1,)], "id int")
    return kql_to_df(
        {"T": df}, f"T | extend r = {expr} | project r"
    ).collect()[0]["r"]


@pytest.mark.slow
def test_ipv6_invalid_inputs_are_null(spark):
    for bad in ["'garbage'", "'1:2:3:4:5:6:7:8:9'", "'1:2:3'",
                "'fe80::1%eth0'", "'2001:db8::1/129'", "'12345::1'",
                "'1.2.3'", "''"]:
        assert _one(spark, f"parse_ipv6({bad})") is None, bad
        assert _one(spark, f"ipv6_compare({bad}, '::1')") is None, bad


def test_ipv6_v4_interop_and_ranges(spark):
    # Kusto parity: a pure IPv4 equals its ::ffff: mapped form
    assert _one(spark, "ipv6_compare('192.168.1.1', '::ffff:192.168.1.1')") == 0
    assert _one(
        spark, "ipv6_is_in_any_range('2002:db8::5',"
        " '2001:db8::/32', '2002::/16')") is True
    assert _one(
        spark, "ipv6_is_in_any_range('2003:db8::5',"
        " '2001:db8::/32', '2002::/16')") is False


def test_ipv4_is_private_blocks(spark):
    cases = [
        ("'10.0.0.1'", True), ("'11.0.0.1'", False),
        ("'172.16.0.0/12'", True), ("'172.15.255.255'", False),
        ("'172.32.0.0'", False), ("'192.168.255.255'", True),
        ("'192.169.0.0'", False),
        # range escaping the block -> NOT private (whole-range rule)
        ("'192.168.0.0/15'", False), ("'10.0.0.0/7'", False),
    ]
    for arg, want in cases:
        assert _one(spark, f"ipv4_is_private({arg})") is want, arg


def test_ipv4_is_in_any_range(spark):
    assert _one(
        spark, "ipv4_is_in_any_range('8.8.8.8', '8.8.0.0/16',"
        " '1.0.0.0/8')") is True
    assert _one(
        spark, "ipv4_is_in_any_range('9.9.9.9', '8.8.0.0/16',"
        " '1.0.0.0/8')") is False
