"""Pins for the round-13 bench gate-instrument hardening (VERDICT r12
item 1 + ADVICE r12 item 3). No SparkSession needed — these pin the pure
decision logic bench.py's isolated runner calls:

- ``_pack_reseal_trigger``: when does a pack median mint an automatic
  same-run re-seal (the by-hand r12 protocol moved into the instrument)?
- ``_grid_code_hash`` / ``_carry_sealed_grids``: sealed ann/scale grids
  are signed with a code hash and carried forward by default runs, with
  staleness flagged instead of silently trusted or wiped.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bench():
    if "bench" in sys.modules:
        return sys.modules["bench"]
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestPackResealTrigger:
    def test_r12_driver_breach_triggers(self):
        # The exact r12 failure: driver pack 3.078 s vs committed seal
        # 2.77 s — only 1.11x the seal, but 2.04x baseline (over the 2x
        # gate). The baseline clause must catch it.
        assert _bench()._pack_reseal_trigger(3.078, 2.77) is True

    def test_seal_consistent_reading_is_quiet(self):
        # The r12 committed seal itself (2.77 s = 1.83x baseline): inside
        # the gate margin and 1.0x the seal — no reseal churn.
        assert _bench()._pack_reseal_trigger(2.77, 2.77) is False

    def test_seal_drift_clause(self):
        # A reading >1.5x the committed seal triggers even when the
        # absolute number is under the gate margin (a fast-seal regime
        # makes the relative clause the sensitive one).
        assert _bench()._pack_reseal_trigger(2.3, 1.5) is True
        assert _bench()._pack_reseal_trigger(2.2, 1.5) is False

    def test_no_seal_falls_back_to_baseline_margin(self):
        b = _bench()
        # 1.9x * 1.51 = 2.869
        assert b._pack_reseal_trigger(2.87, None) is True
        assert b._pack_reseal_trigger(2.86, None) is False

    def test_missing_pack_median_is_quiet(self):
        assert _bench()._pack_reseal_trigger(None, 2.77) is False


class TestSealedGridProvenance:
    def test_code_hash_is_deterministic_hex(self):
        b = _bench()
        h1, h2 = b._grid_code_hash(), b._grid_code_hash()
        assert h1 == h2
        assert len(h1) == 16
        int(h1, 16)  # hex

    def test_matching_hash_carries_grids_quietly(self):
        b = _bench()
        prev = {
            "ann_recall_at_k": {"ivf": {"k10": 0.97}},
            "scale_probe": {"pack": {"exponent": 0.5}},
            "sealed_grids_meta": {"code_hash": "abc", "sealed_extras": True},
        }
        ann, scale, meta, msg = b._carry_sealed_grids(prev, "abc")
        assert msg is None
        assert ann == prev["ann_recall_at_k"]
        assert scale == prev["scale_probe"]
        assert meta["carried_forward"] is True

    def test_hash_mismatch_flags_stale(self):
        b = _bench()
        prev = {
            "scale_probe": {"pack": {"exponent": 0.5}},
            "sealed_grids_meta": {"code_hash": "abc"},
        }
        _, scale, _, msg = b._carry_sealed_grids(prev, "def")
        assert msg is not None and "abc" in msg and "def" in msg
        # stale grids are still carried (visibly flagged), never wiped
        assert scale == prev["scale_probe"]

    def test_unsigned_seal_flags(self):
        b = _bench()
        prev = {"scale_probe": {"pack": {"exponent": 0.5}}}
        _, _, _, msg = b._carry_sealed_grids(prev, "def")
        assert msg is not None and "unsigned" in msg

    def test_no_previous_seal_flags(self):
        _, _, _, msg = _bench()._carry_sealed_grids(None, "def")
        assert msg is not None
