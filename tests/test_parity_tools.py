"""Tests for the round-4 parity adjudication tooling.

Covers the strict (spread-proof) gate arithmetic in
`tools/regate_parity.py`, the multi-seed artifact merger in
`tools/merge_parity_seeds.py`, and the faithfulness of the
repeat-filler torch ablation patch in `tools/train_parity.py`
(reference semantics: `models/utils/common.py:37-73`).
"""

import copy
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import merge_parity_seeds  # noqa: E402
import regate_parity  # noqa: E402


def _artifact(model, seeds, ps_sampled, th_sampled, ps_whole, th_whole,
              epochs=25):
    def side(sampled, whole):
        def block(runs):
            arr = np.asarray(runs, float)
            return {"mean": round(float(arr.mean()), 4),
                    "min": round(float(arr.min()), 4),
                    "max": round(float(arr.max()), 4),
                    "runs": [float(v) for v in runs]}
        return {"sampled": {"oa": block(sampled), "miou": block(sampled)},
                "whole": {"oa": block(whole), "miou": block(whole)}}

    summary = {"pointseg": side(ps_sampled, ps_whole),
               "reference_torch": side(th_sampled, th_whole)}
    gap = {r: {"miou": round(summary["pointseg"][r]["miou"]["mean"]
                             - summary["reference_torch"][r]["miou"]["mean"],
                             4),
               "oa": 0.0}
           for r in ("sampled", "whole")}
    return {"model": model, "epochs": epochs, "batches_per_epoch": 13,
            "npoints": 1024, "same_init": False, "bn_stats": "running",
            "tol": 0.05, "train_seeds": list(seeds), "summary": summary,
            "gap_of_means": gap,
            "train_seconds": {"pointseg": [1.0] * len(seeds),
                              "reference_torch": [1.0] * len(seeds)}}


def _write(tmp_path, art, name="art.json"):
    p = tmp_path / name
    p.write_text(json.dumps(art))
    return str(p)


class TestStrictGate:
    def test_lcb_matches_hand_computation(self, tmp_path):
        ps = [0.80, 0.82, 0.81, 0.83, 0.79]
        th = [0.82, 0.83, 0.81, 0.84, 0.80]
        art = _write(tmp_path, _artifact("M", range(5), ps, th, ps, th))
        r = regate_parity.regate_strict(art, 0.05, 0.05)
        gap = np.mean(ps) - np.mean(th)
        se = np.sqrt(np.var(ps, ddof=1) / 5 + np.var(th, ddof=1) / 5)
        assert r["lcb_sampled"] == pytest.approx(gap - 1.645 * se, abs=1e-4)
        assert r["pass_sampled"] == (gap - 1.645 * se >= -0.05)

    def test_requires_five_seeds(self, tmp_path):
        ps, th = [0.9, 0.9, 0.9], [0.5, 0.5, 0.5]
        art = _write(tmp_path, _artifact("M", range(3), ps, th, ps, th))
        r = regate_parity.regate_strict(art, 0.05, 0.05)
        # pointseg beats torch by +0.4, but n=3 < 5 -> inconclusive.
        assert not r["pass"]

    def test_noise_only_widens_never_rescues(self, tmp_path):
        # A true gap right at -tol: with zero noise it passes exactly;
        # ANY seed noise must push it to fail (the r03 gate did the
        # opposite: noise inflated the allowance).
        base_ps = [0.75] * 5
        base_th = [0.80] * 5
        quiet = _write(tmp_path, _artifact(
            "M", range(5), base_ps, base_th, base_ps, base_th), "q.json")
        rq = regate_parity.regate_strict(quiet, 0.05, 0.05)
        assert rq["pass"]  # gap == -tol, se == 0
        noisy_ps = [0.70, 0.80, 0.72, 0.78, 0.75]
        noisy = _write(tmp_path, _artifact(
            "M", range(5), noisy_ps, base_th, noisy_ps, base_th), "n.json")
        rn = regate_parity.regate_strict(noisy, 0.05, 0.05)
        assert np.mean(noisy_ps) == pytest.approx(0.75)  # same gap
        assert not rn["pass"]  # wider bound -> fail


class TestMergeSeeds:
    def test_merge_concatenates_and_recomputes(self, tmp_path):
        a = _write(tmp_path, _artifact(
            "M", [0, 1, 2], [0.8, 0.82, 0.81], [0.7, 0.71, 0.72],
            [0.8, 0.82, 0.81], [0.7, 0.71, 0.72]), "a.json")
        b = _write(tmp_path, _artifact(
            "M", [3, 4], [0.79, 0.83], [0.73, 0.69],
            [0.79, 0.83], [0.73, 0.69]), "b.json")
        m = merge_parity_seeds.merge([a, b])
        assert m["train_seeds"] == [0, 1, 2, 3, 4]
        runs = m["summary"]["pointseg"]["sampled"]["miou"]["runs"]
        assert runs == [0.8, 0.82, 0.81, 0.79, 0.83]
        expect_gap = np.mean(runs) - np.mean([0.7, 0.71, 0.72, 0.73, 0.69])
        assert m["gap_of_means"]["sampled"]["miou"] == pytest.approx(
            expect_gap, abs=1e-4)

    def test_merge_rejects_duplicate_seeds_and_config_mismatch(
            self, tmp_path):
        a = _write(tmp_path, _artifact(
            "M", [0, 1], [0.8, 0.8], [0.7, 0.7], [0.8, 0.8], [0.7, 0.7]),
            "a.json")
        dup = _write(tmp_path, _artifact(
            "M", [1, 2], [0.8, 0.8], [0.7, 0.7], [0.8, 0.8], [0.7, 0.7]),
            "dup.json")
        with pytest.raises(SystemExit):
            merge_parity_seeds.merge([a, dup])
        other = json.loads(open(a).read())
        other["epochs"] = 10
        other["train_seeds"] = [5]
        bad = _write(tmp_path, other, "bad.json")
        with pytest.raises(SystemExit):
            merge_parity_seeds.merge([a, bad])

    def test_merge_rejects_filler_semantics_mismatch(self, tmp_path):
        """Filler semantics are config identity: a deviant-semantics
        ablation artifact (--torch-repeat-fillers or
        POINTSEG_BQ_FILLER=index) must never merge into a canonical
        gate artifact, while artifacts written before the fields
        existed merge with explicit-default ones."""
        a = _write(tmp_path, _artifact(
            "M", [0, 1], [0.8, 0.8], [0.7, 0.7], [0.8, 0.8], [0.7, 0.7]),
            "a.json")
        for key, deviant in (("torch_repeat_fillers", True),
                             ("bq_filler", "index")):
            art = json.loads(open(a).read())
            art[key] = deviant
            art["train_seeds"] = [5]
            bad = _write(tmp_path, art, f"bad_{key}.json")
            with pytest.raises(SystemExit):
                merge_parity_seeds.merge([a, bad])
        # missing field == explicit default (pre-r04 artifacts merge)
        art = json.loads(open(a).read())
        art["torch_repeat_fillers"] = False
        art["bq_filler"] = "repeat"
        art["train_seeds"] = [6]
        ok = _write(tmp_path, art, "ok.json")
        m = merge_parity_seeds.merge([a, ok])
        assert m["train_seeds"] == [0, 1, 6]
        assert m["bq_filler"] == "repeat"

    def test_merge_rejects_protocol_and_data_mismatch(self, tmp_path):
        """r05 config-identity fields: replicate protocol (init vs
        legacy train-draws-only) and synthetic-data learnability
        (class-colored rgb) both change what a seed run measures, so
        artifacts differing on either must not merge; absent fields
        mean the pre-r05 defaults."""
        a = _write(tmp_path, _artifact(
            "M", [0, 1], [0.8, 0.8], [0.7, 0.7], [0.8, 0.8], [0.7, 0.7]),
            "a.json")
        for key, deviant in (("seed_protocol", "init"),
                             ("class_colors", True)):
            art = json.loads(open(a).read())
            art[key] = deviant
            art["train_seeds"] = [5]
            bad = _write(tmp_path, art, f"bad_{key}.json")
            with pytest.raises(SystemExit):
                merge_parity_seeds.merge([a, bad])
        # explicit defaults still merge with absent fields
        art = json.loads(open(a).read())
        art["seed_protocol"] = "train"
        art["class_colors"] = False
        art["train_seeds"] = [7]
        ok = _write(tmp_path, art, "ok2.json")
        m = merge_parity_seeds.merge([a, ok])
        assert m["train_seeds"] == [0, 1, 7]
        assert m["seed_protocol"] == "train"


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
class TestRepeatFillerPatch:
    """The --torch-repeat-fillers ablation must be the reference group()
    with ONLY the filler slots changed (repeat the nearest in-ball
    member instead of topk's arbitrary out-of-radius leftovers)."""

    @pytest.fixture()
    def groups(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        import models.utils.common as C
        import train_parity

        reference_group = C.group
        train_parity.patch_torch_repeat_fillers()
        patched_group = C.group
        yield torch, reference_group, patched_group
        C.group = reference_group  # unpatch for any other reference test

    def test_dense_balls_bitwise_equal(self, groups):
        torch, ref, patched = groups
        torch.manual_seed(0)
        # tiny cloud, huge radius: every ball saturates K in-radius ->
        # zero filler slots -> the patch must be a no-op.
        coords = torch.rand(2, 16, 3) * 0.1
        feats = torch.rand(2, 16, 5)
        cent = coords[:, :4, :].clone()
        out_ref = ref(cent, coords.clone(), feats, r=10.0, K=8)
        out_pat = patched(cent, coords.clone(), feats, r=10.0, K=8)
        assert torch.equal(out_ref, out_pat)

    def test_sparse_balls_repeat_nearest_member(self, groups):
        torch, _, patched = groups
        # centroid 0 of batch 0 sits alone: only itself in radius.
        coords = torch.zeros(1, 6, 3)
        coords[0, 1:] = 5.0 + torch.arange(5).view(5, 1).float()
        feats = torch.arange(6, dtype=torch.float32).view(1, 6, 1)
        cent = coords[:, :1, :].clone()
        out = patched(cent, coords, feats, r=1.0, K=4)
        # all K slots must be the centroid itself: rel coords 0, feat 0.
        assert torch.equal(out, torch.zeros(1, 1, 4, 4))
