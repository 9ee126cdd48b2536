"""The pandas fixture writer (driver-contract path) must produce the exact
relation the Spark generator produces — both are pure functions of the row
index, so equality is total, not statistical."""

import pandas as pd

from shaclapi_spark import datagen, fixture_io


def _canon(pdf: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    pdf = pdf.copy()
    if "bytes" in pdf.columns:
        pdf["bytes"] = pdf["bytes"].map(lambda b: None if b is None else bytes(b))
    return pdf.sort_values(key_cols).reset_index(drop=True)


def test_clips_pandas_matches_spark(spark):
    n = 500
    a = _canon(fixture_io.clips_pdf(n), ["clip_id", "bytes"])
    b = _canon(datagen.clips_df(spark, n).toPandas(), ["clip_id", "bytes"])
    assert len(a) == len(b)
    for col in ("clip_id", "bytes", "dur_ms", "codec", "transcript"):
        assert list(a[col]) == list(b[col]), col
    # sr_hz: nullable int — compare with None normalization
    assert [None if pd.isna(v) else int(v) for v in a["sr_hz"]] == [
        None if pd.isna(v) else int(v) for v in b["sr_hz"]
    ]


def test_transcripts_pandas_matches_spark(spark):
    n = 500
    a = _canon(fixture_io.transcripts_pdf(n), ["transcript_id"])
    b = _canon(datagen.transcripts_df(spark, n).toPandas(), ["transcript_id"])
    assert a[["transcript_id", "clip_id", "text", "lang"]].equals(
        b[["transcript_id", "clip_id", "text", "lang"]]
    )
    assert list(a["n_tokens"].astype(int)) == list(b["n_tokens"].astype(int))


def test_ensure_fixture_idempotent(tmp_path):
    p1 = fixture_io.ensure_fixture_pandas(100, root=str(tmp_path))
    m1 = {k: (v, __import__("os").path.getmtime(v)) for k, v in p1.items() if k != "_marker"}
    p2 = fixture_io.ensure_fixture_pandas(100, root=str(tmp_path))
    for k, (v, mt) in m1.items():
        assert p2[k] == v
        assert __import__("os").path.getmtime(v) == mt
