"""CLI dispatch and the check aggregator (legacy text + JSONL)."""

import json
import os

import numpy as np
import pytest

from factorized_tpu.check import check_dir, parse_jsonl, parse_text_log


REFERENCE_LOG = """\
[{'input_dims': [300, 5, 20]}]
0 1.08 1.03 saving model
1 1.07 1.02
scoring y_hat
mae:  0.993
corr:  0.62
mult_acc:  0.34
mult f_score:  0.49
Confusion Matrix :
[[354   0]
 [332   0]]
Classification Report :
              precision    recall  f1-score   support

       False    0.51603   1.00000   0.68077       354
        True    0.00000   0.00000   0.00000       332

    accuracy                        0.51603       686
   macro avg    0.25802   0.50000   0.34038       686
weighted avg    0.26629   0.51603   0.35130       686
Accuracy  0.77
mae:  1.05
corr:  0.44
mult_acc:  0.31
Accuracy  0.71
"""

MISSING_LOG = """\
all present 0.11 0.22 0.33
l missing 0.5 0.6 0.7
a missing 0.4 0.5 0.6
v missing 0.3 0.4 0.5
scoring y_hat_nol
mae:  1.11
Accuracy  0.70
scoring y_hat_noa
mae:  1.22
Accuracy  0.65
"""


class TestCheckText:
    def test_best_values_per_file(self, tmp_path):
        (tmp_path / "run1.txt").write_text(REFERENCE_LOG)
        summary = check_dir(str(tmp_path), out=lambda *a: None)
        best = summary["run1.txt"]
        assert best["mae"] == 0.993      # min over the file
        assert best["acc"] == 0.77       # max
        assert best["corr"] == 0.62
        assert best["fscore"] == pytest.approx(0.35130)

    def test_missing_condition_filter(self, tmp_path):
        p = tmp_path / "m.txt"
        p.write_text(MISSING_LOG)
        m_l, _ = parse_text_log(str(p), condition="l")
        assert m_l["mae"] == [1.11]
        m_a, _ = parse_text_log(str(p), condition="a")
        assert m_a["mae"] == [1.22]

    def test_recon_min_aggregation(self, tmp_path):
        (tmp_path / "a.txt").write_text(MISSING_LOG)
        (tmp_path / "b.txt").write_text(
            MISSING_LOG.replace("0.5 0.6 0.7", "0.1 0.9 0.2")
        )
        summary = check_dir(str(tmp_path), out=lambda *a: None)
        np.testing.assert_allclose(
            summary["_recon_min"]["l missing"], [0.1, 0.6, 0.2]
        )


class TestCheckJsonl:
    def test_parse_final_records(self, tmp_path):
        p = tmp_path / "r.jsonl"
        recs = [
            {"kind": "epoch", "epoch": 0, "train_loss": 1.0},
            {"kind": "final", "mae": 0.95, "corr": 0.5,
             "binary_accuracy": 0.74, "mult_f_score": 0.4},
            {"kind": "final",
             "y_hat": {"mae": 0.9, "binary_accuracy": 0.76}},
        ]
        p.write_text("\n".join(json.dumps(r) for r in recs))
        m = parse_jsonl(str(p))
        assert m["mae"] == [0.95, 0.9]
        assert m["acc"] == [0.74, 0.76]
        summary = check_dir(str(tmp_path), out=lambda *a: None)
        assert summary["r.jsonl"]["mae"] == 0.9
        assert summary["r.jsonl"]["acc"] == 0.76


class TestCLI:
    @pytest.mark.slow
    def test_cli_moud_single(self, tmp_path, capsys):
        from factorized_tpu.cli import main

        cfg = {
            "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
            "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
            "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
            "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
            "gamma2_shape": 8, "out_shape": 8,
            "batchsize": 32, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main([
            "moud", "--config", str(cfg_path), "--mode", "single",
            "--type", "kl_ef", "--out", str(tmp_path / "runs"),
        ])
        assert rc == 0
        outp = capsys.readouterr().out
        assert "Accuracy" in outp
        runs = os.listdir(tmp_path / "runs")
        assert any(f.endswith(".jsonl") for f in runs)
        # aggregator consumes what the CLI wrote
        summary = check_dir(str(tmp_path / "runs"), out=lambda *a: None)
        assert any("acc" in v for v in summary.values())

    @pytest.mark.slow
    def test_cli_mosi_raw_feature_path(self, tmp_path, capsys):
        """--feature-selection 0 trains end-to-end on the raw covarep
        1:35 + full-FACET path (reference -s 0, mfm_mosi.py:37,60-73)
        with input_dims picked up from the actual feature widths."""
        from factorized_tpu.cli import main

        cfg = {"seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
               "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
               "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
               "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
               "gamma2_shape": 8, "out_shape": 8,
               "batchsize": 32, "num_epochs": 1}
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main([
            "mosi", "--config", str(cfg_path), "--mode", "single",
            "--type", "mfm", "--feature-selection", "0",
            "--normalize-covarep", "--out", str(tmp_path / "runs"),
        ])
        assert rc == 0
        runs = [f for f in os.listdir(tmp_path / "runs")
                if f.endswith(".jsonl")]
        assert runs
        with open(tmp_path / "runs" / runs[0]) as f:
            cfgs = [json.loads(l) for l in f
                    if json.loads(l).get("kind") == "config"]
        # synthetic raw widths: covarep 1:35 -> 34, full FACET = 43
        assert cfgs[0]["input_dims"] == [300, 34, 43]

    def test_cli_raw_flags_refused_off_mosi(self, tmp_path):
        from factorized_tpu.cli import main

        with pytest.raises(SystemExit, match="only applies to the mosi"):
            main(["moud", "--mode", "single",
                  "--feature-selection", "0",
                  "--out", str(tmp_path / "runs")])
        with pytest.raises(SystemExit, match="only apply to"):
            main(["multitrait", "--style", "pom", "--epochs", "1",
                  "--normalize-covarep",
                  "--out", str(tmp_path / "runs")])

    @pytest.mark.slow
    def test_cli_search_sampling_distinct(self, tmp_path):
        from factorized_tpu.cli import main

        cfg = {"seqlength": 4, "num_epochs": 1, "batchsize": 32}
        cfg_path = tmp_path / "t.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main([
            "mosi", "--mode", "search", "--trials", "2", "--type", "m_d",
            "--out", str(tmp_path / "runs"), "--epochs", "1",
        ])
        assert rc == 0
        runs = sorted(os.listdir(tmp_path / "runs"))
        assert len(runs) == 2
        # two sampled configs should differ
        cfgs = []
        for r in runs:
            with open(tmp_path / "runs" / r) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["kind"] == "config":
                        cfgs.append({k: rec[k] for k in
                                     ("h_dims", "memsize", "zl_size")})
        assert cfgs[0] != cfgs[1]


class TestMultitrait:
    def test_parse_and_best(self, tmp_path):
        from factorized_tpu.check import best_multitrait

        log = """config stuff
mae: [1.2, 0.9, 1.5]
corr: [0.3, 0.5, 0.2]
mult_acc: [0.3, 0.2, 0.4]
mae: [1.0, 1.1, 1.4]
corr: [0.4, 0.4, 0.6]
mult_acc: [0.2, 0.5, 0.1]
"""
        (tmp_path / "pom.txt").write_text(log)
        res = best_multitrait(str(tmp_path), out=lambda *a: None)
        assert res["mae"] == [1.0, 0.9, 1.4]
        assert res["corr"] == [0.4, 0.5, 0.6]
        assert res["mult_acc"] == [0.3, 0.5, 0.4]

    def test_jsonl_and_text_aggregate_together(self, tmp_path):
        from factorized_tpu.check import best_multitrait

        (tmp_path / "pom.txt").write_text("mae: [1.2, 0.9, 1.5]\n"
                                          "corr: [0.3, 0.5, 0.2]\n")
        recs = [
            {"kind": "config", "style": "pom"},
            {"kind": "final", "mae": [1.0, 1.1, 1.4],
             "corr": [0.4, 0.4, 0.6], "mult_acc": [0.2, 0.5, 0.1]},
        ]
        (tmp_path / "pom_0.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs))
        res = best_multitrait(str(tmp_path), out=lambda *a: None)
        assert res["mae"] == [1.0, 0.9, 1.4]
        assert res["corr"] == [0.4, 0.5, 0.6]
        assert res["mult_acc"] == [0.2, 0.5, 0.1]

    def test_pom_style_acc_row_and_want_indices(self, tmp_path, capsys):
        """POM mode prints a per-trait acc row scaled x100 and drops
        trait 14 from 17-trait logs (reference check.py:241,247)."""
        from factorized_tpu.check import best_multitrait

        mae = [round(1.0 + 0.01 * i, 2) for i in range(17)]
        corr = [round(0.1 + 0.01 * i, 2) for i in range(17)]
        acc = [round(0.2 + 0.01 * i, 2) for i in range(17)]
        log = (f"OrderedDict([('x', 1)])\nmae: {mae}\n"
               f"corr: {corr}\nmult_acc: {acc}\n")
        (tmp_path / "pom1.txt").write_text(log)
        res = best_multitrait(str(tmp_path), style="pom")
        outp = capsys.readouterr().out
        assert len(res["mae"]) == 16  # trait 14 dropped
        assert res["mae"] == mae[:14] + mae[15:]
        # acc row is x100
        assert res["acc"] == acc[:14] + acc[15:]
        assert "acc: 20.0&21.0" in outp
        # per-file record counts printed
        assert "pom1.txt 3" in outp

    def test_ie2_style_per_file_reset(self, tmp_path, capsys):
        """ie2 mode resets accumulators per file (check.py:122-127):
        each log reports its OWN bests, not directory-wide."""
        from factorized_tpu.check import best_multitrait

        (tmp_path / "a.txt").write_text(
            "mae: [1.0, 2.0, 3.0]\ncorr: [0.5, 0.4, 0.3]\n"
            "mae: [1.5, 1.5, 1.5]\ncorr: [0.2, 0.6, 0.2]\n")
        (tmp_path / "b.txt").write_text(
            "mae: [9.0, 9.0, 9.0]\ncorr: [0.9, 0.9, 0.9]\n")
        res = best_multitrait(str(tmp_path), style="ie2")
        assert res["a.txt"]["mae"] == [1.0, 1.5, 1.5]
        assert res["a.txt"]["corr"] == [0.5, 0.6, 0.3]
        # b's 9.0s must NOT be polluted by a's (per-file reset)
        assert res["b.txt"]["mae"] == [9.0, 9.0, 9.0]
        outp = capsys.readouterr().out
        assert "mae: 1.0&1.5&1.5" in outp
        assert "mae: 9.0&9.0&9.0" in outp

    def test_per_file_run_counts(self, tmp_path):
        """check_dir surfaces per-file trial counts (reference counts
        OrderedDict config lines, check.py:175-177,190)."""
        (tmp_path / "r.txt").write_text(
            "OrderedDict([('a', 1)])\nmae:  0.9\n"
            "OrderedDict([('a', 2)])\nmae:  0.8\n")
        recs = [{"kind": "config", "seed": 1},
                {"kind": "final", "mae": 0.7},
                {"kind": "config", "seed": 2},
                {"kind": "final", "mae": 0.6}]
        (tmp_path / "r.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs))
        summary = check_dir(str(tmp_path), out=lambda *a: None)
        assert summary["r.txt"]["_runs"] == 2
        assert summary["r.jsonl"]["_runs"] == 2

    def test_dataset_shapes_and_styles(self):
        from factorized_tpu.data import multitrait

        for style, n_traits, side in (("pom", 17, "left"),
                                      ("iemocap", 4, "right")):
            Xtr, ytr, Xv, yv, Xte, yte = multitrait.get_data(6, style=style)
            assert Xtr.shape[1:] == (6, 410)
            assert ytr.shape == (Xtr.shape[0], n_traits)
            # 70/10/20 video-order split of 300 single-segment videos
            assert (Xtr.shape[0], Xv.shape[0], Xte.shape[0]) == (210, 30, 60)
        # POM scale 1..7, IEMOCAP 0..3
        assert ytr.min() >= 0.0 and ytr.max() <= 3.0

    def test_cli_multitrait_end_to_end(self, tmp_path, capsys):
        from factorized_tpu.check import best_multitrait
        from factorized_tpu.cli import main

        cfg = {
            "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
            "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
            "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
            "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
            "gamma2_shape": 8, "out_shape": 8,
            "batchsize": 64, "num_epochs": 1,
        }
        cfg_path = tmp_path / "tiny.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main(["multitrait", "--style", "iemocap", "--config",
                   str(cfg_path), "--mode", "single",
                   "--out", str(tmp_path / "runs")])
        assert rc == 0
        outp = capsys.readouterr().out
        assert "mae: [" in outp  # the bracketed reference format
        # the aggregator consumes the CLI's JSONL
        res = best_multitrait(str(tmp_path / "runs"), out=lambda *a: None)
        assert len(res["mae"]) == 4
        assert all(np.isfinite(v) for v in res["mae"])


class TestCLIVariants:
    def _cfg_path(self, tmp_path):
        cfg = {
            "seqlength": 4, "h_dims": [8, 8, 8], "memsize": 8,
            "zy_size": 8, "zl_size": 8, "za_size": 8, "zv_size": 8,
            "fy_size": 8, "fl_size": 8, "fa_size": 8, "fv_size": 8,
            "att1_shape": 8, "att2_shape": 8, "gamma1_shape": 8,
            "gamma2_shape": 8, "out_shape": 8,
            "batchsize": 64, "num_epochs": 1,
        }
        p = tmp_path / "tiny.json"
        p.write_text(json.dumps(cfg))
        return str(p)

    @pytest.mark.parametrize("argset", [
        ["mmmo", "--type", "kl_ef"],
        ["you", "--type", "kl_ef"],
        ["mosi", "--type", "mfm", "--missing", "1"],
        ["mosi", "--type", "mfm", "--zeros", "1"],
        ["mosi", "--type", "s2s", "--missing", "1"],
        ["mosi", "--type", "bm", "--missing", "1"],
        ["mosi", "--type", "m_b"],
    ])
    def test_cli_variant_dispatch(self, tmp_path, argset):
        from factorized_tpu.cli import main

        rc = main(argset + ["--config", self._cfg_path(tmp_path),
                            "--mode", "single",
                            "--out", str(tmp_path / "runs")])
        assert rc == 0
        assert any(f.endswith(".jsonl")
                   for f in os.listdir(tmp_path / "runs"))

    def test_best_mfn_configs(self):
        from factorized_tpu.config import best_mfn_mosi_config

        mae = best_mfn_mosi_config("mae")
        assert mae.h_dims == [88, 48, 16] and mae.memsize == 128
        acc = best_mfn_mosi_config("acc")
        assert acc.h_dims == [64, 8, 80] and acc.memsize == 400
        with pytest.raises(ValueError):
            best_mfn_mosi_config("nope")

    @pytest.mark.slow
    def test_cli_predictor_best_mfn(self, tmp_path):
        """The predictor command with --mode best routes to the pinned
        MFN configs (regression: logger.record kw collision crashed
        this path)."""
        from factorized_tpu.cli import main

        rc = main(["predictor", "--kind", "mfn", "--mode", "best",
                   "--best", "mae", "--epochs", "1", "--batchsize", "128",
                   "--out", str(tmp_path / "runs")])
        assert rc == 0
        runs = [f for f in os.listdir(tmp_path / "runs")
                if f.endswith(".jsonl")]
        assert runs
        cfgs = [json.loads(line) for line in
                open(tmp_path / "runs" / runs[0])]
        rec = next(r for r in cfgs if r["kind"] == "config")
        assert rec["predictor_kind"] == "mfn"
        assert rec["h_dims"] == [88, 48, 16] and rec["memsize"] == 128
