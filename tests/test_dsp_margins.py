"""Boundary-margin telemetry for the DSP invariant legs (round-5
verdict #7).

The driver-checked q_dsp_parity / q_media_invariants slots emit boolean
invariants; when one flips, the driver signal is a bare hash mismatch
that localizes to nothing. The repo-side twin `dsp_margin_report`
projects the quantized margins behind the same booleans
(m_i = floor(1e6 * normalized margin), ok_i == (m_i >= 0), computed in
one place inside the UDFs so the two can never disagree). This test
asserts every margin is non-negative and, on failure, names the leg,
doc_id, and distance past the boundary in the assertion message — plus
prints a per-leg headroom floor so shrinking margins are visible before
they flip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocess_spark.plans.composites import dsp_margin_report
from tests.conftest import SF_DIR


def test_all_margins_nonnegative(spark):
    rep = dsp_margin_report(spark, SF_DIR)
    bad = (
        rep.filter(
            (F.col("m1") < 0) | (F.col("m2") < 0) | (F.col("m3") < 0)
        )
        .select("modality", "doc_id", "m1", "m2", "m3")
        .limit(50)
        .collect()
    )
    assert not bad, "invariant margin(s) past the failure boundary: " + "; ".join(
        f"{r['modality']} doc {r['doc_id']} "
        f"(m1={r['m1']}, m2={r['m2']}, m3={r['m3']})"
        for r in bad
    )


def test_margin_headroom_report(spark):
    """Every leg keeps real headroom: the worst margin per leg stays
    above 1% of the boundary distance (quantized: 10_000). A leg that
    decays toward zero shows up here rounds before it flips the driver
    boolean. Exact-equality legs sit at exactly 0 by construction and
    are held to == 0 instead."""
    rep = dsp_margin_report(spark, SF_DIR)
    rows = (
        rep.groupBy("modality")
        .agg(
            F.min("m1").alias("m1"),
            F.min("m2").alias("m2"),
            F.min("m3").alias("m3"),
        )
        .collect()
    )
    assert len(rows) == 15  # 12 dsp legs + 3 media legs (round-6 #7)
    # (modality, column) pairs whose margin is an exact-equality /
    # discrete count: 0 is the healthy value, not a warning sign
    exact = {
        ("dsp_clahe", "m1"), ("dsp_clahe", "m2"), ("dsp_clahe", "m3"),
        ("dsp_nlm", "m1"),
        ("dsp_denoise", "m3"),
        ("dsp_cubic", "m1"), ("dsp_cubic", "m2"),
        ("dsp_gauss_adaptive", "m1"), ("dsp_gauss_adaptive", "m2"),
        ("dsp_gauss_adaptive", "m3"),
        ("exif_autorotate", "m1"), ("exif_autorotate", "m2"),
        ("exif_autorotate", "m3"),
        ("h264_i16", "m1"), ("h264_i16", "m3"),
        # media legs: enhance endpoints are exact 0/255 mappings;
        # deskew m1's unskewed pages sit at gain exactly 1 (identity
        # argmax) and m3 is the exact half-degree recovery; the
        # enhance m3 slot is a structural constant
        ("image_enhance", "m1"), ("image_enhance", "m2"),
        ("image_enhance", "m3"),
        ("image_deskew", "m1"), ("image_deskew", "m3"),
    }
    weak = []
    for r in rows:
        for c in ("m1", "m2", "m3"):
            v = r[c]
            if (r["modality"], c) in exact:
                if v != 0:
                    weak.append(f"{r['modality']}.{c}={v} (expected exact 0)")
            elif v < 10_000:
                weak.append(f"{r['modality']}.{c}={v} (<1% headroom)")
        print(
            f"# margin floor {r['modality']}: "
            f"m1={r['m1']} m2={r['m2']} m3={r['m3']}"
        )
    assert not weak, "margin headroom eroded: " + "; ".join(weak)
