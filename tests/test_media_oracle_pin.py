"""Pin the committed media-oracle VALUES literals to the corpus.

The `media_pixel_checksums` / `media_audio_checksums` driver oracles are
VALUES literals generated offline by tools/gen_media_oracle.py from
javax.imageio / javax.sound.sampled ground truth. If the synthetic media
corpus ever changes without the constants being regenerated (it DID change
in r11, adding 16-bit rows), the stale constants become a driver-only
failure — the escape class the r11 verdict flagged (#4). These tests
regenerate the expected tuples through the same javax path and assert they
equal the committed SQL literals, so corpus drift fails pytest, not the
driver.
"""

from __future__ import annotations

import re
import sys

import pytest

import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from mlvectordb_spark.queries import ORACLE_SQL

_TUPLE_RE = re.compile(r"\('(m\d+)',\s*([\d,\s-]+?)\)")


def committed_tuples(name: str) -> list[tuple]:
    out = []
    for m in _TUPLE_RE.finditer(ORACLE_SQL[name]):
        nums = [int(x.strip()) for x in m.group(2).split(",")]
        out.append((m.group(1), *nums))
    assert out, f"no VALUES tuples parsed from ORACLE_SQL[{name!r}]"
    return out


@pytest.fixture(scope="module")
def gen(spark):
    try:
        import gen_media_oracle as G

        # Probe the JVM bridge once; environments without javax media
        # support (headless/stripped JREs) skip rather than fail.
        # Class.forName RAISES on absence — a bare package attribute
        # access returns a truthy JavaPackage even for missing classes,
        # so it can never trigger the skip (r12 review).
        spark._jvm.java.lang.Class.forName("javax.imageio.ImageIO")
        spark._jvm.java.lang.Class.forName(
            "javax.sound.sampled.AudioSystem"
        )
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"javax ground-truth bridge unavailable: {e}")
    return G


def test_pixel_constants_match_corpus(spark, gen):
    assert committed_tuples("media_pixel_checksums") == gen.pixel_tuples(
        spark
    )


def test_audio_constants_match_corpus(spark, gen):
    assert committed_tuples("media_audio_checksums") == gen.audio_tuples(
        spark
    )
