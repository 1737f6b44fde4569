"""Repro loop for the cross-process tensor-parallel deadlock (VERDICT r3
weak #1): runs the test_two_process_model_axis_spanning TRAIN phase N times
with the hardened harness; on a hang both ranks get SIGABRT so faulthandler
prints the exact Python frame each rank is stuck in.

  python scripts/repro_mh_tp.py [n_attempts] [--cold-cache]
"""

import os
import shutil
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.mh_harness import run_workers  # noqa: E402

TINY = ["--config_override", "encoder_layers=2", "encoder_size=16",
        "projection_size=8", "pred_net_layers=1", "pred_net_size=16",
        "joint_size=8", "embedding_size=8", "time_reduction_index=0",
        "learning_rate=0.01", "grad_clip_norm=1.0"]
PAD = ["--pad_frames", "64", "--pad_tokens", "8"]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_devices=1, cache_dir=None, xla_extra=""):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n_devices}"
                        + (" " + xla_extra if xla_extra else ""))
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    if cache_dir is not None:
        env["RNNT_COMPILE_CACHE"] = cache_dir
    return env


def make_corpus(root):
    from rnnt_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(1)
    words = ["ab", "cd", "ef"]
    corpus = os.path.join(root, "corpus")
    for split, n in [("train-mini", 8), ("dev-mini", 6)]:
        d = os.path.join(corpus, split, "1", "10")
        os.makedirs(d)
        lines = []
        for i in range(n):
            utt = f"1-10-{i:04d}"
            ws = [words[int(rng.integers(len(words)))] for _ in range(2)]
            audio = (rng.standard_normal(9600) * 0.1).astype(np.float32)
            write_wav(os.path.join(d, f"{utt}.wav"), audio, 16000)
            lines.append(f"{utt} {' '.join(w.upper() for w in ws)}")
        with open(os.path.join(d, "1-10.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    out = os.path.join(root, "data")
    r = subprocess.run(
        [sys.executable, "-m", "rnnt_tpu.cli.preprocess_librispeech",
         "--data_dir", corpus, "--output_dir", out,
         "--train_splits", "train-mini", "--dev_splits", "dev-mini",
         "--test_splits", "dev-mini", "--token_type", "word-piece",
         "--vocab_size", "32", "--pad_vocab", "--num_shards", "4"],
        cwd=REPO, env=_worker_env(4), timeout=300,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert r.returncode == 0, r.stdout
    return out


def main():
    n_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cold = "--cold-cache" in sys.argv
    xla_extra = ""
    for a in sys.argv[1:]:
        if a.startswith("--xla="):
            xla_extra = a[len("--xla="):]
    root = tempfile.mkdtemp(prefix="mh_tp_repro_")
    data = make_corpus(root)
    print(f"corpus at {data}; {n_attempts} attempts; cold_cache={cold}")

    fails = 0
    for attempt in range(n_attempts):
        out_dir = os.path.join(root, f"run{attempt}")
        cache = os.path.join(root, f"cache{attempt}") if cold else None
        train = ["--mode", "train", "--data_dir", data,
                 "--output_dir", out_dir, "--batch_size", "4",
                 "--n_epochs", "2", "--steps_per_log", "1",
                 "--steps_per_checkpoint", "2", "--eval_size", "1",
                 "--model_parallel", "2", "--no-bf16"] + PAD + TINY
        port = _free_port()
        cmds = [[sys.executable, "-m", "rnnt_tpu.cli.run_rnnt",
                 "--multihost", "--coordinator_address", f"localhost:{port}",
                 "--num_processes", "2", "--process_id", str(pid)] + train
                for pid in (0, 1)]
        results = run_workers(cmds, env=_worker_env(1, cache, xla_extra),
                              cwd=REPO, timeout=600, stall_timeout=180)
        ok = all(rc == 0 for rc, _ in results)
        print(f"attempt {attempt}: {'OK' if ok else 'FAIL'} "
              f"(rcs={[rc for rc, _ in results]})")
        if not ok:
            fails += 1
            for i, (rc, text) in enumerate(results):
                log = os.path.join(root, f"attempt{attempt}_rank{i}.log")
                with open(log, "w") as f:
                    f.write(text)
                print(f"  rank {i} rc={rc} log={log}")
                tail = "\n".join(text.splitlines()[-40:])
                print("  --- tail ---\n" + "\n".join(
                    "  " + ln for ln in tail.splitlines()))
        shutil.rmtree(out_dir, ignore_errors=True)
    print(f"{n_attempts - fails}/{n_attempts} attempts passed; "
          f"artifacts in {root}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
