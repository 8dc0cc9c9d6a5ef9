"""Randomized end-to-end IC cards: render random card transcripts as
page images, run the REAL pipeline (salted shuffle -> OCR UDF) and the
real field expressions, and compare every field against an independent
Python re-derivation of the fork's rules (fastapi_app.py:588-816). The
oracle-gated queries use doc_id-arithmetic transcripts; this test covers
the space those can't reach — arbitrary digit combinations, both parity
genders, keyword-fallback rows, unknown-prefix postcodes.
"""

import random
import re

import pandas as pd
from pyspark.sql import functions as F

from paddleocr_spark.functions.corrections import apply_line_corrections
from paddleocr_spark.functions.fields import (
    IC_RE,
    POSTCODE_RE,
    POSTCODE_STATE,
    RELIGIONS,
    extract_ic_fields,
)

_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _word(rng, lo=3, hi=8):
    return "".join(rng.choice(_LETTERS) for _ in range(rng.randint(lo, hi)))


def _card(rng):
    lines = ["MYKAD", f"{_word(rng)} {_word(rng)}"]
    if rng.random() < 0.8:
        ic = (
            f"{rng.randrange(10**6):06d}-{rng.randrange(100):02d}-"
            f"{rng.randrange(10**4):04d}"
        )
        lines.append(ic)
    else:
        lines.append(rng.choice(["LELAKI", "PEREMPUAN"]))
    lines.append(f"LORONG {_word(rng)} JALAN {_word(rng)}")
    lines.append(f"{rng.randrange(10**5):05d} TAMAN {_word(rng)}")
    lines.append(rng.choice(RELIGIONS))
    return lines


def _expected(lines):
    # per-line chain, matching the pipeline's line granularity (\s rules
    # must never join lines)
    text = "\n".join(apply_line_corrections(line) for line in lines)
    m = re.search(IC_RE, text)
    ic = m.group(1) if m else ""
    if ic:
        gender = "Male" if int(ic[-1]) % 2 == 1 else "Female"
    elif "PEREMPUAN" in text:
        gender = "Female"
    elif "LELAKI" in text:
        gender = "Male"
    else:
        gender = ""
    rel = next((r for r in RELIGIONS if r in text), "")
    pm = re.search(POSTCODE_RE, text)
    pc = pm.group(1) if pm else ""
    state = POSTCODE_STATE.get(pc[:2], "") if pc else ""
    return {
        "ic_number": ic,
        "gender": gender,
        "religion": rel,
        "postcode": pc,
        "state": state,
    }


def test_random_ic_cards_full_pipeline(spark):
    from paddleocr_spark.kernels.font import render_page
    from paddleocr_spark.kernels.png import encode_gray_png
    from paddleocr_spark.plans.pipeline import extract_pages

    rng = random.Random(20260817)
    cards = [_card(rng) for _ in range(40)]
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"card://{i}" for i in range(len(cards))],
                "html": [
                    encode_gray_png(render_page(lines)) for lines in cards
                ],
            }
        )
    )
    results = extract_pages(pages, num_partitions=8)
    fields = extract_ic_fields(
        results.withColumnRenamed("extracted_text", "raw_ocr_text").select(
            "url", "raw_ocr_text"
        )
    )
    got = {
        r["url"]: r.asDict()
        for r in fields.select(
            "url", "ic_number", "gender", "religion", "postcode", "state"
        ).collect()
    }
    assert len(got) == len(cards)
    bad = []
    for i, lines in enumerate(cards):
        want = _expected(lines)
        have = {k: got[f"card://{i}"][k] for k in want}
        if have != want:
            bad.append((lines, want, have))
    assert not bad, f"{len(bad)} cards mismatched, first: {bad[:2]}"
