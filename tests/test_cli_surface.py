"""Smoke coverage for the CLI surface end-to-end on a micro corpus.

The reference is driven entirely through its CLIs (SURVEY.md §1 L7); these
tests pin each entry point's contract: preprocess_librispeech → run_rnnt
train/eval → quantize_model → streaming_transcribe → corpus_stats /
debug_dataset, all on a 10-utterance synthetic LibriSpeech-layout corpus.
"""

import os

import numpy as np
import pytest

from rnnt_tpu.data.audio_io import write_wav

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)


WORDS = ["ab", "cd", "ef"]


@pytest.fixture(scope="module")
def ls_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls")
    rng = np.random.default_rng(0)
    for split, n in [("train-mini", 6), ("dev-mini", 2), ("test-mini", 2)]:
        d = root / split / "1" / "10"
        d.mkdir(parents=True)
        lines = []
        for i in range(n):
            utt = f"1-10-{i:04d}"
            words = [WORDS[int(rng.integers(len(WORDS)))] for _ in range(2)]
            audio = (rng.standard_normal(9600) * 0.1).astype(np.float32)
            write_wav(str(d / f"{utt}.wav"), audio, 16000)
            lines.append(f"{utt} {' '.join(w.upper() for w in words)}")
        (d / "1-10.trans.txt").write_text("\n".join(lines) + "\n")
    return root


@pytest.fixture(scope="module")
def data_dir(ls_corpus, tmp_path_factory):
    import sys

    from rnnt_tpu.cli import preprocess_librispeech as cli

    out = tmp_path_factory.mktemp("data")
    argv_save = sys.argv
    sys.argv = ["preprocess_librispeech",
                "--data_dir", str(ls_corpus), "--output_dir", str(out),
                "--train_splits", "train-mini", "--dev_splits", "dev-mini",
                "--test_splits", "test-mini", "--token_type", "character",
                "--num_shards", "2"]
    try:
        cli.main()
    finally:
        sys.argv = argv_save
    assert sorted(p for p in os.listdir(out) if p.startswith("train-"))
    return out


TINY = ["--config_override", "encoder_layers=2", "encoder_size=16",
        "projection_size=8", "pred_net_layers=1", "pred_net_size=16",
        "joint_size=8", "embedding_size=8", "time_reduction_index=0"]


@pytest.fixture(scope="module")
def run_dir(data_dir, tmp_path_factory):
    from rnnt_tpu.cli import run_rnnt

    out = tmp_path_factory.mktemp("run")
    run_rnnt.main(["--mode", "train", "--data_dir", str(data_dir),
                   "--output_dir", str(out), "--batch_size", "8",
                   "--n_epochs", "4", "--steps_per_log", "2",
                   "--steps_per_checkpoint", "4", "--eval_size", "1",
                   # bf16 mel transfer: halves input bytes; must train the
                   # same (model casts inputs to compute dtype regardless)
                   "--transfer_dtype", "bfloat16",
                   "--no-bf16"] + TINY)
    assert any(p.startswith("checkpoint_") for p in os.listdir(out))
    return out


def test_run_rnnt_eval_cli(data_dir, run_dir, capsys):
    from rnnt_tpu.cli import run_rnnt

    run_rnnt.main(["--mode", "test", "--data_dir", str(data_dir),
                   "--output_dir", str(run_dir), "--checkpoint", str(run_dir),
                   "--batch_size", "8", "--no-bf16"])
    out = capsys.readouterr().out
    assert "eval_loss=" in out and "eval_wer=" in out


def test_run_rnnt_eval_pinned_step_preserves_sidecar(data_dir, run_dir,
                                                    capsys):
    """Eval a SPECIFIC checkpoint_NNNN dir without re-passing the training
    overrides: the config/tokenizer sidecars must resolve from the step
    dir's parent run dir, and the eval must NOT rewrite the run dir's
    sidecar (a clobber would replace the recorded recipe with defaults and
    break every later restore of this run)."""
    from rnnt_tpu.cli import run_rnnt

    step_dir = sorted(p for p in os.listdir(run_dir)
                      if p.startswith("checkpoint_") and
                      not p.endswith(".orbax"))[-1]
    sidecar = os.path.join(run_dir, "config.json")
    before = open(sidecar).read()
    assert '"encoder_layers": 2' in before  # the recipe the run recorded
    run_rnnt.main(["--mode", "test", "--data_dir", str(data_dir),
                   "--output_dir", str(run_dir),
                   "--checkpoint", os.path.join(str(run_dir), step_dir),
                   "--batch_size", "8", "--no-bf16"])
    out = capsys.readouterr().out
    assert "eval_wer=" in out
    assert open(sidecar).read() == before, \
        "eval rewrote the training config sidecar"


def test_quantize_model_cli(run_dir, capsys):
    from rnnt_tpu.cli import quantize_model

    quantize_model.main(["--checkpoint", str(run_dir)])
    out = capsys.readouterr().out
    assert "int8" in out
    assert os.path.exists(os.path.join(str(run_dir), "model_int8.npz"))


def test_streaming_transcribe_cli(ls_corpus, run_dir, capsys):
    from rnnt_tpu.cli import streaming_transcribe

    wav = str(ls_corpus / "test-mini" / "1" / "10" / "1-10-0000.wav")
    streaming_transcribe.main(["--checkpoint", str(run_dir),
                               "--simulate_file", wav])
    assert "FINAL:" in capsys.readouterr().out


def test_transcribe_file_pinned_step_checkpoint(ls_corpus, run_dir, capsys):
    """Every checkpoint-consuming CLI accepts a pinned-step dir
    (run/checkpoint_NNNNNNNN): config + tokenizer sidecars resolve from the
    parent run dir via checkpoint.sidecar_dir."""
    from rnnt_tpu.cli import transcribe_file

    step_dir = sorted(p for p in os.listdir(run_dir)
                      if p.startswith("checkpoint_") and
                      not p.endswith(".orbax"))[-1]
    wav = str(ls_corpus / "test-mini" / "1" / "10" / "1-10-0000.wav")
    transcribe_file.main(["--checkpoint",
                          os.path.join(str(run_dir), step_dir), "-i", wav])
    capsys.readouterr()  # undertrained transcript may be blank; no crash


def test_corpus_stats_cli(ls_corpus, capsys):
    from rnnt_tpu.cli import corpus_stats

    corpus_stats.main(["--dir", str(ls_corpus / "train-mini")])
    out = capsys.readouterr().out
    assert "total" in out and "mean" in out


def test_debug_dataset_cli(data_dir, tmp_path, capsys):
    from rnnt_tpu.cli import debug_dataset

    debug_dataset.main(["--data_dir", str(data_dir), "--split", "train",
                        "--save_plots", str(tmp_path / "plots"),
                        "--n_plots", "2"])
    out = capsys.readouterr().out
    assert "All checks passed" in out
    assert os.path.exists(str(tmp_path / "plots" / "spec_0.png"))


def test_run_rnnt_eval_cli_forwards_loss_impl(data_dir, run_dir):
    """--loss_impl travels into run_evaluate (round-1 hazard: eval parsed the
    flag but dropped it, silently falling back to the lattice-materializing
    loss — OOM at parity geometry)."""
    from rnnt_tpu.cli import run_rnnt
    from rnnt_tpu.train import loop as loop_mod

    seen = {}
    real = loop_mod.run_evaluate

    def spy(*a, **k):
        seen["loss_impl"] = k.get("loss_impl")
        return real(*a, **k)

    loop_mod.run_evaluate = spy
    try:
        run_rnnt.main(["--mode", "test", "--data_dir", str(data_dir),
                       "--output_dir", str(run_dir),
                       "--checkpoint", str(run_dir), "--batch_size", "8",
                       "--loss_impl", "fused", "--no-bf16"])
    finally:
        loop_mod.run_evaluate = real
    assert seen["loss_impl"] == "fused"


def test_run_rnnt_quantized_eval_cli(data_dir, run_dir, capsys):
    """--quantized evals with int8-dequantized weights (the BASELINE int8
    WER-delta path): metrics print and match the fp eval's format."""
    from rnnt_tpu.cli import quantize_model, run_rnnt

    qpath = os.path.join(str(run_dir), "model_int8.npz")
    if not os.path.exists(qpath):
        quantize_model.main(["--checkpoint", str(run_dir)])
        capsys.readouterr()
    run_rnnt.main(["--mode", "test", "--data_dir", str(data_dir),
                   "--output_dir", str(run_dir), "--checkpoint", str(run_dir),
                   "--batch_size", "8", "--no-bf16", "--quantized", qpath])
    out = capsys.readouterr().out
    assert "eval_loss=" in out and "eval_wer=" in out


def test_run_rnnt_int8_exec_eval_cli(data_dir, run_dir, capsys):
    """--quantized --int8_exec evals with TRUE int8 pred+joint compute:
    decode metrics print (loss is skipped by design — eval_loss=nan) and the
    WER matches the dequantized-weight eval on this tiny model."""
    import re

    from rnnt_tpu.cli import quantize_model, run_rnnt

    qpath = os.path.join(str(run_dir), "model_int8.npz")
    if not os.path.exists(qpath):
        quantize_model.main(["--checkpoint", str(run_dir)])
        capsys.readouterr()
    common = ["--mode", "test", "--data_dir", str(data_dir),
              "--output_dir", str(run_dir), "--checkpoint", str(run_dir),
              "--batch_size", "8", "--no-bf16", "--quantized", qpath]
    run_rnnt.main(common)
    wer_deq = re.search(r"eval_wer=([0-9.]+)", capsys.readouterr().out)
    run_rnnt.main(common + ["--int8_exec"])
    out = capsys.readouterr().out
    assert "eval_loss=nan" in out, out
    wer_int8 = re.search(r"eval_wer=([0-9.]+)", out)
    assert wer_deq and wer_int8, out
    assert abs(float(wer_int8.group(1)) - float(wer_deq.group(1))) < 0.05
