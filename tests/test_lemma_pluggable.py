"""Pluggable morphology (VERDICT r3 #7): the lemma dictionary loads
from a data file behind the same API, and the engine (Spark UDF
workers) + the pure-Python oracle both rebuild from it — byte-identity
under ANY dictionary, not just the shipped test fixture.

Runs in a SUBPROCESS: the dictionary is resolved at module import
(driver and every Python worker), so swapping it needs a fresh
interpreter + fresh Spark session with SEARCHENGINE_LEMMA_DICT set.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

ALT_DICT = textwrap.dedent(
    """\
    # alternate morphology table (surface \\t lemma \\t pos)
    котики\tкот\tСУЩ
    котик\tкот\tСУЩ
    спят\tспать\tГЛ
    и\tи\tСОЮЗ
    # homograph: two candidates for one surface
    стекла\tстекло\tСУЩ
    стекла\tстечь\tГЛ
    """
)

_SCRIPT = textwrap.dedent(
    """\
    import sys

    from searchengine_spark.functions import textproc
    from searchengine_spark.functions.lemma_dict import LEMMA_DICT

    # the module-level dictionary IS the file's content
    assert LEMMA_DICT["котики"] == [("кот", "СУЩ")], LEMMA_DICT.get("котики")
    assert LEMMA_DICT["стекла"] == [("стекло", "СУЩ"), ("стечь", "ГЛ")]

    # driver-side fused kernel (this is also the oracle's kernel —
    # tests/oracle.py imports textproc directly)
    want = ["кот", "спать", "стекло", "стечь", "oovword"]
    got = textproc.tokenize_lemmatize("котики спят и стекла oovword")
    assert got == want, got  # 'и' is stop-POS in the alt table too

    # engine side: the SAME stream through the Spark UDF on workers
    from searchengine_spark.functions.udfs import tokenize_lemmatize_udf
    from searchengine_spark.session import get_spark

    spark = get_spark("alt-lemma-dict", master="local[2]",
                      shuffle_partitions=2)
    row = (
        spark.createDataFrame(
            [(1, "котики спят и стекла oovword")], "doc_id long, text string"
        )
        .select(tokenize_lemmatize_udf("text").alias("lemmas"))
        .collect()[0]
    )
    assert list(row["lemmas"]) == want, row["lemmas"]
    spark.stop()
    print("ALT_DICT_OK")
    """
)


def test_alternate_dictionary_file_drives_engine_and_oracle(tmp_path):
    dict_path = tmp_path / "alt_lemmas.tsv"
    dict_path.write_text(ALT_DICT, encoding="utf-8")
    env = dict(os.environ)
    env["SEARCHENGINE_LEMMA_DICT"] = str(dict_path)
    env.setdefault("PYTHONPATH", "")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env["PYTHONPATH"]
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ALT_DICT_OK" in proc.stdout
