"""fix_mojibake: ftfy-style UTF-8-read-as-cp1252 repair."""

from html5ever_elixir_spark.operators.textstats import (
    fix_mojibake,
    fix_mojibake_text,
)


def test_single_and_double_encode_peel():
    real = "café — “quoted” ünïcode"
    moji1 = real.encode("utf-8").decode("cp1252", errors="replace")
    # build mojibake through the WHATWG-complete path (0x9d survives)
    raw = real.encode("utf-8")
    moji1 = "".join(
        chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else bytes([b]).decode("cp1252")
        for b in raw
    )
    assert fix_mojibake_text(moji1) == (real, 1)
    moji2 = "".join(
        chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else bytes([b]).decode("cp1252")
        for b in moji1.encode("utf-8")
    )
    assert fix_mojibake_text(moji2) == (real, 2)


def test_clean_text_untouched():
    assert fix_mojibake_text("plain ascii text") == ("plain ascii text", 0)
    # legit non-ASCII that is NOT valid-UTF-8-under-cp1252 stays put
    assert fix_mojibake_text("café résumé") == ("café résumé", 0)
    assert fix_mojibake_text("日本語テキスト") == ("日本語テキスト", 0)
    assert fix_mojibake_text("") == ("", 0)


def test_spark_batch(spark):
    real = "naïve — déjà vu"
    moji = real.encode("utf-8").decode("cp1252")
    docs = spark.createDataFrame(
        [(1, "clean"), (2, "prefix " + moji), (3, "中文 untouched")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in fix_mojibake(docs).collect()}
    assert (rows[1].text_fixed, rows[1].n_passes) == ("clean", 0)
    assert (rows[2].text_fixed, rows[2].n_passes) == ("prefix " + real, 1)
    assert (rows[3].text_fixed, rows[3].n_passes) == ("中文 untouched", 0)
