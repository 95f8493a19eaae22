"""Round-13 batch-8 fuzzers — foreign twins from the python stdlib:
csv.writer/csv.reader for parse_csv, posixpath/ntpath for parse_path,
and a seconds round-trip property for totimespan. Same discipline as
the ipaddress and DuckDB-gamma fuzzers: the twin implements the
semantics independently; divergences fail loudly."""

import csv
import io
import json
import ntpath
import posixpath
import random

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

import pytest

pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


_FIELD_POOL = [
    "plain", "with space", "a,b", 'say "hi"', "", "x,y,z", '",",',
    "trail ", " lead", "1234", 'quote"inside', ",", '""',
]


def test_fuzz_parse_csv_vs_csv_module(spark):
    rng = random.Random(1310)
    cases = []
    for _ in range(40):
        fields = [rng.choice(_FIELD_POOL) for _ in range(rng.randint(1, 6))]
        buf = io.StringIO()
        csv.writer(buf, lineterminator="").writerow(fields)
        cases.append((buf.getvalue(), fields))
    df = spark.createDataFrame(
        [(i, line) for i, (line, _) in enumerate(cases)], "i int, s string"
    )
    out = kql_to_df(
        {"T": df}, "T | extend f = parse_csv(s) | project i, f"
    ).collect()
    got = {r["i"]: r["f"] for r in out}
    for i, (line, fields) in enumerate(cases):
        assert got[i] == fields, (i, line, got[i], fields)


def _gen_path(rng):
    name = rng.choice(["file", "data_2024", "report-v2", "x"])
    ext = rng.choice(["txt", "tar.gz", "json", ""])
    fname = f"{name}.{ext}" if ext else name
    dirs = [rng.choice(["a", "tmp", "log s", "deep.dir"])
            for _ in range(rng.randint(0, 3))]
    kind = rng.randrange(3)
    if kind == 0:  # posix
        return "/" + "/".join(dirs + [fname]), posixpath
    if kind == 1:  # windows drive
        return "C:\\" + "\\".join(dirs + [fname]), ntpath
    return "/".join(dirs + [fname]), posixpath  # relative posix


def test_fuzz_parse_path_vs_stdlib(spark):
    rng = random.Random(1311)
    cases = [_gen_path(rng) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "i int, p string"
    )
    out = kql_to_df(
        {"T": df}, "T | extend b = parse_path(p) | project i, b"
    ).collect()
    got = {r["i"]: json.loads(r["b"]) for r in out}
    for i, (p, mod) in enumerate(cases):
        b = got[i]
        assert b["Filename"] == mod.basename(p), (p, b)
        assert b["DirectoryPath"] == mod.dirname(p), (p, b)
        want_ext = mod.splitext(mod.basename(p))[1].lstrip(".")
        assert b["Extension"] == want_ext, (p, b)
        drive = ntpath.splitdrive(p)[0] if mod is ntpath else ""
        assert b["RootPath"] == drive, (p, b)
        # DirectoryName = basename of the directory path
        assert b["DirectoryName"] == mod.basename(mod.dirname(p)), (p, b)


def test_fuzz_totimespan_round_trip(spark):
    rng = random.Random(1312)
    secs = [rng.randrange(0, 5 * 86400) for _ in range(30)]
    cases = []
    for t in secs:
        d, r = divmod(t, 86400)
        h, r = divmod(r, 3600)
        m, s = divmod(r, 60)
        text = (f"{d}.{h:02d}:{m:02d}:{s:02d}" if d
                else f"{h:02d}:{m:02d}:{s:02d}")
        cases.append((text, float(t)))
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, s string"
    )
    out = kql_to_df(
        {"T": df}, "T | extend v = totimespan(s) | project i, v"
    ).collect()
    got = {r["i"]: r["v"] for r in out}
    for i, (text, want) in enumerate(cases):
        assert got[i] == want, (text, got[i], want)
