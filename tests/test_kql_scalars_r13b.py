"""Round-13 scalar batch 8 — parse_path / parse_csv / format_bytes /
totimespan / has_any_index / base64_decode_toarray / new_guid / rand.
Edge pins beyond the catalog row's uniform data."""

import json

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _one(spark, expr):
    df = spark.createDataFrame([(1,)], "id int")
    return kql_to_df(
        {"T": df}, f"T | extend r = {expr} | project r"
    ).collect()[0]["r"]


def test_parse_path_windows_posix_url_ads(spark):
    got = json.loads(_one(spark, r"parse_path('C:\\temp\\file.txt')"))
    assert got == {
        "Scheme": "", "RootPath": "C:", "DirectoryPath": "C:\\temp",
        "DirectoryName": "temp", "Filename": "file.txt",
        "Extension": "txt", "AlternateDataStream": "",
    }
    got = json.loads(_one(spark, "parse_path('/usr/local/bin/tool')"))
    assert got["DirectoryPath"] == "/usr/local/bin"
    assert got["DirectoryName"] == "bin"
    assert got["Filename"] == "tool"
    assert got["Extension"] == ""
    got = json.loads(_one(spark, "parse_path('https://h/a/d.pdf')"))
    assert got["Scheme"] == "https" and got["Extension"] == "pdf"
    got = json.loads(_one(spark, r"parse_path('C:\\x\\f.txt:ads')"))
    assert got["Filename"] == "f.txt"
    assert got["AlternateDataStream"] == "ads"
    # bare filename: no directory at all
    got = json.loads(_one(spark, "parse_path('f.txt')"))
    assert got["DirectoryPath"] == "" and got["Filename"] == "f.txt"


def test_parse_csv_quoting(spark):
    assert _one(spark, "parse_csv('a,b,c')") == ["a", "b", "c"]
    assert _one(
        spark, 'parse_csv(\'x,"a,b",,"he said ""hi"""\')'
    ) == ["x", "a,b", "", 'he said "hi"']
    assert _one(spark, "parse_csv('')") == [""]
    assert _one(spark, "parse_csv('a,')") == ["a", ""]


def test_format_bytes(spark):
    assert _one(spark, "format_bytes(4096)") == "4 KB"
    assert _one(spark, "format_bytes(1)") == "1 Bytes"
    assert _one(spark, "format_bytes(0)") == "0 Bytes"
    assert _one(spark, "format_bytes(1073741824)") == "1 GB"
    assert _one(spark, "format_bytes(125678, 2)") == "122.73 KB"
    assert _one(spark, "format_bytes(1048576, 1, 'KB')") == "1024 KB"
    assert _one(spark, "format_bytes(1099511627776)") == "1 TB"


def test_totimespan(spark):
    assert _one(spark, "totimespan('01:02:03')") == 3723.0
    assert _one(spark, "totimespan('2.01:00:00')") == 176400.0
    assert _one(spark, "totimespan('00:00:01.5')") == 1.5
    assert _one(spark, "totimespan('garbage')") is None
    assert _one(spark, "totimespan('1:2:3')") == 3723.0
    # timespan literal form handled by the phase-1 rewrite
    assert _one(spark, "totimespan('5m')") is None  # string form only


def test_has_any_index(spark):
    assert _one(
        spark, "has_any_index('hello world', pack_array('x', 'wor', 'h'))"
    ) == 1
    assert _one(spark, "has_any_index('abc', pack_array('x', 'y'))") == -1
    assert _one(spark, "has_any_index('abc', pack_array('abc'))") == 0


def test_base64_decode_toarray(spark):
    assert _one(spark, "base64_decode_toarray('SGk=')") == [72, 105]
    assert _one(spark, "base64_decode_toarray('')") == []
    # round trip with the existing encode
    assert _one(
        spark,
        "base64_decode_toarray(base64_encode_tostring('AB'))",
    ) == [65, 66]


def test_new_guid_and_rand(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id int")
    out = kql_to_df(
        {"T": df},
        "T | extend g = new_guid(), r1 = rand(), rn = rand(1000)"
        " | project g, r1, rn",
    ).collect()
    gs = [r["g"] for r in out]
    assert len(set(gs)) == 50 and all(len(g) == 36 for g in gs)
    assert all(0.0 <= r["r1"] < 1.0 for r in out)
    assert all(0 <= r["rn"] < 1000 for r in out)


def test_format_timespan(spark):
    assert _one(spark, "format_timespan(3723, 'hh:mm:ss')") == "01:02:03"
    assert _one(
        spark, "format_timespan(176400, 'd.hh:mm:ss')"
    ) == "2.01:00:00"
    assert _one(spark, "format_timespan(1.25, 's.ff')") == "1.25"
    assert _one(spark, "format_timespan(-3723, 'h:m:s')") == "-1:2:3"
    # round trip with totimespan
    assert _one(
        spark,
        "totimespan(format_timespan(totimespan('3.04:05:06'),"
        " 'd.hh:mm:ss'))",
    ) == 3 * 86400 + 4 * 3600 + 5 * 60 + 6.0
    with pytest.raises(ValueError, match="constant pattern"):
        kql_to_df(
            {"T": spark.createDataFrame([(1,)], "id int")},
            "T | extend r = format_timespan(5, id)",
        )


def test_convert_units(spark):
    assert _one(spark, "convert_length(1.0, 'Mile', 'Foot')") == (
        pytest.approx(5280.0)
    )
    assert _one(spark, "convert_length(2.54, 'Centimeter', 'Inch')") == (
        pytest.approx(1.0)
    )
    assert _one(spark, "convert_mass(1.0, 'Pound', 'Ounce')") == (
        pytest.approx(16.0)
    )
    assert _one(spark, "convert_speed(36.0, 'KilometerPerHour',"
                " 'MeterPerSecond')") == pytest.approx(10.0)
    assert _one(spark, "convert_angle(180.0, 'Degree', 'Radian')") == (
        pytest.approx(3.141592653589793)
    )
    assert _one(spark, "convert_energy(1.0, 'KilowattHour', 'Joule')") == (
        pytest.approx(3.6e6)
    )
    assert _one(spark, "convert_volume(1.0, 'UsGallon', 'Liter')") == (
        pytest.approx(3.785411784)
    )
    # round trip identity across every family factor
    assert _one(
        spark,
        "convert_force(convert_force(7.25, 'PoundForce', 'Newton'),"
        " 'Newton', 'PoundForce')",
    ) == pytest.approx(7.25)


def test_convert_temperature_affine(spark):
    assert _one(spark, "convert_temperature(0.0, 'DegreeCelsius',"
                " 'Kelvin')") == pytest.approx(273.15)
    assert _one(spark, "convert_temperature(212.0, 'DegreeFahrenheit',"
                " 'DegreeCelsius')") == pytest.approx(100.0)
    assert _one(spark, "convert_temperature(-40.0, 'DegreeCelsius',"
                " 'DegreeFahrenheit')") == pytest.approx(-40.0)


def test_convert_units_loud_failures(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown unit"):
        _one(spark, "convert_length(1.0, 'Parsec', 'Meter')")
    with _pt.raises(ValueError, match="constant unit"):
        kql_to_df(
            {"T": __import__("pyspark").sql.SparkSession.getActiveSession()
             .createDataFrame([(1, "Meter")], "id int, u string")},
            "T | extend r = convert_length(1.0, u, 'Meter')",
        )
