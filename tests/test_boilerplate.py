"""CCNet-style boilerplate line removal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.operators.text import frequent_lines, remove_boilerplate_lines

BANNER = "subscribe to our newsletter"
FOOTER = "copyright example corp"


def _df(spark):
    rows = [
        (0, f"{BANNER}\nunique zero content\n{FOOTER}"),
        (1, f"{BANNER}\nunique one content\n{FOOTER}"),
        (2, f"{BANNER}\nunique two content here\n{FOOTER}"),
        (3, "entirely unique document\nwith two lines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_frequent_lines(spark):
    freq = {
        r["line"]: r["doc_frequency"]
        for r in frequent_lines(_df(spark), "text", min_doc_frequency=3).collect()
    }
    assert freq == {BANNER: 3, FOOTER: 3}


def test_remove_boilerplate_preserves_order(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            _df(spark), "text", min_doc_frequency=3
        ).collect()
    }
    assert out[0] == "unique zero content"
    assert out[1] == "unique one content"
    assert out[2] == "unique two content here"
    assert out[3] == "entirely unique document\nwith two lines"


def test_remove_boilerplate_to_new_column(spark):
    df = remove_boilerplate_lines(
        _df(spark), "text", min_doc_frequency=3, out_col="clean_text"
    )
    assert set(df.columns) == {"doc_id", "text", "clean_text"}
    row = df.filter(F.col("doc_id") == 0).first()
    assert BANNER in row["text"] and BANNER not in row["clean_text"]


def test_all_lines_removed_yields_empty(spark):
    rows = [(i, BANNER) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_lines(df, "text", min_doc_frequency=3).collect()
    assert all(r["text"] == "" for r in out)


def test_scrub_pii_and_counts(spark):
    from snowy_json_spark.operators.text import pii_counts, scrub_pii

    rows = [
        (0, "contact bob.smith+x@sub.example.co.uk today"),
        (1, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
        (2, "call +1 (555) 123-4567 or +44-20-1234-5678 now"),
        (3, "clean text with no sensitive spans at all"),
        (4, "version 1.2.3.4 of the parser"),  # IP-shaped → scrubbed (documented trade)
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: (r["s"], r["c"].asDict())
        for r in df.select(
            "id", scrub_pii(F.col("t")).alias("s"), pii_counts(F.col("t")).alias("c")
        ).collect()
    }
    assert got[0][0] == "contact [EMAIL] today"
    assert got[0][1] == {"n_email": 1, "n_ip": 0, "n_phone": 0}
    assert got[1][0] == "server at [IP] and [IP] rebooted"
    assert got[1][1]["n_ip"] == 2
    assert got[2][0] == "call [PHONE] or [PHONE] now"
    assert got[2][1]["n_phone"] == 2
    assert got[3][0] == rows[3][1]
    assert got[4][0] == "version [IP] of the parser"


def test_repetition_flags(spark):
    from snowy_json_spark.operators.text import repetition_flags

    unique = "\n".join(
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}" for i in range(10)
    )
    dup_lines = "repeated line content here\n" * 8 + "one unique closing line"
    loop = "buy now " * 40  # one bigram dominates
    rows = [(0, unique), (1, dup_lines), (2, loop), (3, "")]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["f"].asDict()
        for r in df.select(
            "id", repetition_flags(F.col("t")).alias("f")
        ).collect()
    }
    assert got[0]["keep"]
    assert not got[1]["dup_line_ok"]
    assert not got[2]["top_bigram_ok"]
    assert got[3]["keep"]  # empty: vacuous pass


def test_dup_line_fraction_values(spark):
    from snowy_json_spark.operators.text import dup_line_char_fraction

    df = spark.createDataFrame(
        [("aaaa\nbbbb\naaaa",), ("aaaa\nbbbb",)], "t string"
    )
    got = [
        r["f"]
        for r in df.select(dup_line_char_fraction(F.col("t")).alias("f")).collect()
    ]
    assert got[0] == pytest.approx(4 / 12)  # one extra 'aaaa' copy
    assert got[1] == 0.0


def test_remove_boilerplate_preserves_null_text(spark):
    df = spark.createDataFrame(
        [(0, BANNER), (1, BANNER), (2, BANNER), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(df, "text", min_doc_frequency=3).collect()}
    assert out[0] == ""      # emptied: every line was frequent
    assert out[3] is None    # NULL stays NULL, not ''


def test_mono_id_fallback_warns_and_id_col_is_silent(spark):
    """Without id_col the operator warns (mono-id + localCheckpoint
    fallback — materializes the input; corpus-scale callers should key
    on a real column); with id_col no warning is emitted."""
    import warnings

    df = _df(spark)
    with pytest.warns(UserWarning, match="id_col"):
        remove_boilerplate_lines(df, "text", min_doc_frequency=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        remove_boilerplate_lines(df, "text", min_doc_frequency=3, id_col="doc_id")
