"""Measured per-tier precision guidance.

``--precision bf16`` (bfloat16 compute, fp32 master params/optimizer/BN)
wins where activation HBM traffic dominates and LOSES where it forces
extra relayouts around tiny ops. The table below is the measured
fp32→bf16 throughput ratio on a v5e (bench_zoo --bf16, BASELINE.md bf16
tier rows, r4 quiet re-run); tiers measured below ``WARN_THRESHOLD`` get a
CLI warning so a user following the bf16 pitch cannot silently pay -20%
on the wrong tier.
"""

from __future__ import annotations

from typing import Optional

WARN_THRESHOLD = 0.95

# (method, dataset) -> measured bf16/fp32 samples/s ratio (v5e, r4).
BF16_MEASURED_GAIN = {
    ("FC_STGNN", "CMAPSS"): 1.08,
    ("HierCorrPool", "CMAPSS"): 1.03,
    ("STGNN", "CMAPSS"): 0.98,
    ("ST_GCN", "PHM2012"): 0.80,
    ("DVGTformer", "CMAPSS"): 0.97,
    ("DVGTformer", "NCMAPSS"): 0.96,
    ("GRU_CM", "NCMAPSS"): 1.56,
    ("GAT_LSTM", "PHM2012"): 0.98,
    ("GAT_LSTM", "XJTU_SY"): 0.93,
    ("LOGO_bearing", "PHM2012"): 1.19,
    ("LOGO_bearing", "XJTU_SY"): 1.01,
    ("HierCorrPool_bearing", "PHM2012"): 0.96,
    ("HierCorrPool_bearing", "XJTU_SY"): 1.01,
}


def bf16_guidance(method: str, dataset: str) -> Optional[str]:
    """A warning string when bf16 is measured to LOSE on this tier
    (None = no measured loss / tier not measured)."""
    gain = BF16_MEASURED_GAIN.get((method, dataset))
    if gain is not None and gain < WARN_THRESHOLD:
        return (
            f"--precision bf16 is measured {gain:.2f}x fp32 throughput on "
            f"{method}/{dataset} (v5e, BASELINE.md bf16 table) — this tier "
            f"is latency-bound, not HBM-bound, and bf16 relayouts cost more "
            f"than they save. Consider fp32 here.")
    return None


# (method, dataset) -> measured 5-seed wall-clock ratio of the vmapped
# seed-parallel runner vs sequential runs (v5e, bench_zoo --vectorized 5,
# BASELINE.md seed-parallel table, r5 quiet-chip back-to-back A/Bs). The
# gain tracks the INVERSE of single-seed MFU: launch-latency-bound tiers
# gain 2-4.5x; tiers whose MXU or HBM recurrence traffic is already the
# binding resource gain little or lose.
VECTORIZED_MEASURED_GAIN = {
    ("ST_GCN", "PHM2012"): 3.41,
    ("STGNN", "CMAPSS"): 4.46,
    ("FC_STGNN", "CMAPSS"): 2.28,
    ("GAT_LSTM", "PHM2012"): 2.05,
    ("HierCorrPool", "CMAPSS"): 1.66,
    ("GRU_CM", "NCMAPSS"): 1.57,
    ("HierCorrPool_bearing", "PHM2012"): 1.48,
    ("DVGTformer", "NCMAPSS"): 0.77,
    ("LOGO_bearing", "PHM2012"): 0.60,
}


def vectorized_guidance(method: str, dataset: str) -> Optional[str]:
    """A warning string when the seed-parallel runner is measured to LOSE
    vs sequential runs on this tier (None = measured win / not measured)."""
    gain = VECTORIZED_MEASURED_GAIN.get((method, dataset))
    if gain is not None and gain < 1.0:
        return (
            f"--vectorized_runs is measured {gain:.2f}x the SEQUENTIAL "
            f"5-seed wall-clock on {method}/{dataset} (v5e, BASELINE.md "
            f"seed-parallel table) — this tier's binding resource (MXU "
            f"panels / recurrence HBM traffic) multiplies with the seed "
            f"axis. Sequential runs are faster here.")
    return None
