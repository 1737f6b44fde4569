"""Record shard round-trip + bucketing/padding pipeline tests."""

import numpy as np
import pytest

from rnnt_tpu.config import tiny_config
from rnnt_tpu.data import records
from rnnt_tpu.data.pipeline import (
    bucket_batches, pad_batch, preprocess_utterance)
from rnnt_tpu.data.tokenizer import CharTokenizer
from rnnt_tpu.data.audio_io import read_wav, write_wav


def _ex(t, u, feat=8, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(1, 30, u).astype(np.int32)
    return {
        "mel_specs": rng.standard_normal((t, feat)).astype(np.float32),
        "pred_inp": np.concatenate([[0], labels]).astype(np.int32),
        "labels": labels,
        "spec_lengths": np.int32(t),
        "label_lengths": np.int32(u),
    }


def test_records_roundtrip(tmp_path):
    exs = [_ex(10, 3, seed=1), _ex(20, 5, seed=2), _ex(7, 2, seed=3)]
    paths = records.write_shards(
        iter(exs), str(tmp_path / "train-{shard:03d}-of-{total:03d}.rnr"),
        num_shards=2)
    assert len(paths) == 2
    got = list(records.read_shards(str(tmp_path / "train-*.rnr")))
    assert len(got) == 3
    # round-robin: shard0 has ex0, ex2; shard1 has ex1
    by_len = sorted(got, key=lambda e: int(e["spec_lengths"]))
    np.testing.assert_array_equal(by_len[1]["mel_specs"], exs[0]["mel_specs"])
    for e in got:
        assert set(e) == set(exs[0])


def test_records_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "x.rnr")
    with records.RecordShardWriter(path) as w:
        w.write(_ex(5, 2))
    raw = bytearray(open(path, "rb").read())
    raw[-3] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        list(records.read_shard(path))


def test_host_disjoint_shards(tmp_path):
    exs = [_ex(5 + i, 2, seed=i) for i in range(6)]
    records.write_shards(iter(exs), str(tmp_path / "s-{shard}-{total}.rnr"),
                         num_shards=4)
    a = list(records.read_shards(str(tmp_path / "s-*.rnr"),
                                 process_index=0, process_count=2))
    b = list(records.read_shards(str(tmp_path / "s-*.rnr"),
                                 process_index=1, process_count=2))
    assert len(a) + len(b) == 6
    lens_a = {int(np.asarray(e["spec_lengths"]).item()) for e in a}
    lens_b = {int(np.asarray(e["spec_lengths"]).item()) for e in b}
    assert not (lens_a & lens_b)


def test_bucket_batches_shapes():
    exs = [_ex(t, u, seed=t * 10 + u)
           for t, u in [(50, 10), (60, 12), (100, 20), (120, 30), (500, 100),
                        (40, 8), (55, 14)]]
    batches = list(bucket_batches(iter(exs), batch_size=2,
                                  t_buckets=[64, 128, 512],
                                  u_buckets=[16, 32, 128]))
    assert batches  # got something
    seen_shapes = set()
    total_real = 0
    for b in batches:
        B, T, F = b["mel_specs"].shape
        assert B == 2
        assert T in (64, 128, 512)
        assert b["labels"].shape[1] in (16, 32, 128)
        assert b["pred_inp"].shape[1] == b["labels"].shape[1] + 1
        seen_shapes.add((T, b["labels"].shape[1]))
        n_real = int(b.get("num_real", 2))
        total_real += n_real
        # padding is zeros beyond lengths (real rows only; repeat-padded
        # filler rows keep their content but get zeroed lengths)
        for i in range(n_real):
            t = int(b["spec_lengths"][i])
            assert np.all(b["mel_specs"][i, t:] == 0)
    assert total_real == len(exs)


def test_pad_batch_contents():
    exs = [_ex(5, 2, seed=1), _ex(8, 3, seed=2)]
    b = pad_batch(exs, 10, 4)
    np.testing.assert_array_equal(b["mel_specs"][0, :5], exs[0]["mel_specs"])
    np.testing.assert_array_equal(b["labels"][1, :3], exs[1]["labels"])
    assert b["labels"][0, 2:].sum() == 0


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, sr)
    got, got_sr = read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(got, audio, atol=1e-4)


def test_preprocess_utterance():
    cfg = tiny_config(mel_bins=16, downsample_factor=1, sample_rate=16000)
    tok = CharTokenizer()
    audio = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    ex = preprocess_utterance(audio, 16000, "Hello World", tok, cfg)
    assert ex["labels"].shape[0] == 11
    assert ex["pred_inp"][0] == 0  # preprocessing.py:181 prepended start
    np.testing.assert_array_equal(ex["pred_inp"][1:], ex["labels"])
    assert ex["mel_specs"].shape[1] == 16
    assert int(ex["spec_lengths"]) == ex["mel_specs"].shape[0]


def test_shuffle_stream():
    from rnnt_tpu.data.pipeline import shuffle_stream

    items = [{"i": np.int32(i)} for i in range(50)]
    out1 = [int(e["i"]) for e in shuffle_stream(iter(items), 16, seed=1)]
    out2 = [int(e["i"]) for e in shuffle_stream(iter(items), 16, seed=2)]
    assert sorted(out1) == list(range(50))  # permutation, nothing lost
    assert out1 != list(range(50))          # actually shuffled
    assert out1 != out2                     # seed-dependent
    # buffer 0/1 = passthrough
    out3 = [int(e["i"]) for e in shuffle_stream(iter(items), 1, seed=1)]
    assert out3 == list(range(50))


def test_write_shards_rejects_colliding_pattern(tmp_path):
    # a pattern without a {shard} field would make every writer clobber the
    # same file; must fail loudly, not corrupt silently
    with pytest.raises(ValueError, match="shard"):
        records.write_shards(
            iter([_ex(5, 2)]), str(tmp_path / "train.rnr"), num_shards=2)


def test_prefetch_preserves_order_and_errors():
    from rnnt_tpu.data.pipeline import prefetch

    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_threaded_reader_same_examples(tmp_path):
    from rnnt_tpu.data.pipeline import batches_from_shards

    exs = [_ex(t=10 + i % 7, u=2 + i % 5, seed=i) for i in range(40)]
    records.write_shards(
        iter(exs), str(tmp_path / "train-{shard:02d}.rnr"), num_shards=4)
    pat = str(tmp_path / "train-*.rnr")

    def example_multiset(**kw):
        out = []
        for b in batches_from_shards(pat, 4, shuffle_buffer=8, seed=0, **kw):
            n = int(b.get("num_real", b["labels"].shape[0]))
            for i in range(n):
                t, u = int(b["spec_lengths"][i]), int(b["label_lengths"][i])
                out.append((t, u, float(b["mel_specs"][i, :t].sum())))
        return sorted(out)

    # parallel readers interleave nondeterministically but must yield the
    # exact same multiset of examples as the serial reader
    assert example_multiset(reader_threads=3) == example_multiset()


def test_threaded_reader_requires_shuffle(tmp_path):
    from rnnt_tpu.data.pipeline import batches_from_shards

    records.write_shards(
        iter([_ex(5, 2)]), str(tmp_path / "t-{shard}.rnr"), num_shards=1)
    with pytest.raises(ValueError, match="shuffle_buffer"):
        next(batches_from_shards(str(tmp_path / "t-*.rnr"), 1,
                                 reader_threads=2))


def test_prefetch_abandoned_consumer_stops_producer():
    """Early-exiting consumers (eval's max_batches break) must not leave the
    producer thread blocked in q.put holding resources."""
    import gc
    import threading
    import time as time_mod

    from rnnt_tpu.data.pipeline import prefetch

    produced = []

    def slow_infinite():
        i = 0
        while True:
            produced.append(i)
            yield i
            i += 1

    before = threading.active_count()
    it = prefetch(slow_infinite(), depth=2)
    assert next(it) == 0
    it.close()  # what GC does when the iterator is abandoned
    del it
    gc.collect()
    deadline = time_mod.time() + 5.0
    while threading.active_count() > before and time_mod.time() < deadline:
        time_mod.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    n = len(produced)
    time_mod.sleep(0.3)
    assert len(produced) == n, "producer still running after consumer close"


def test_scan_lengths_matches_full_read(tmp_path):
    """Metadata-only scan (payloads skipped with seeks) must report the same
    per-example lengths as fully deserializing — it feeds the multi-host
    lockstep batch counting."""
    exs = [_ex(t=5 + i, u=1 + i % 3, seed=i) for i in range(7)]
    records.write_shards(iter(exs), str(tmp_path / "s-{shard:05d}.rnr"),
                         num_shards=3)
    full = [(int(np.asarray(e["spec_lengths"]).item()),
             int(np.asarray(e["label_lengths"]).item()))
            for e in records.read_shards(str(tmp_path / "s-*.rnr"))]
    scanned = [(d["spec_lengths"], d["label_lengths"])
               for d in records.scan_lengths(str(tmp_path / "s-*.rnr"))]
    assert scanned == full
    # host-disjoint scan partitions exactly like read_shards
    a = list(records.scan_lengths(str(tmp_path / "s-*.rnr"),
                                  process_index=0, process_count=2))
    b = list(records.scan_lengths(str(tmp_path / "s-*.rnr"),
                                  process_index=1, process_count=2))
    assert len(a) + len(b) == 7


@pytest.mark.slow
def test_parallel_preprocess_matches_serial(tmp_path):
    """--workers N featurization must produce byte-identical examples in the
    same order as the serial path (imap keeps corpus order; workers load +
    featurize + tokenize with the same sidecar config/tokenizer)."""
    from rnnt_tpu.data import librispeech, pipeline
    from rnnt_tpu.data.tokenizer import CharTokenizer

    # tiny LibriSpeech-layout corpus
    root = tmp_path / "corpus"
    d = root / "mini" / "1" / "2"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        utt = f"1-2-{i:04d}"
        audio = (rng.standard_normal(8000 + 1600 * i) * 0.1).astype(np.float32)
        write_wav(str(d / f"{utt}.wav"), audio, 16000)
        lines.append(f"{utt} AB CD")
    (d / "1-2.trans.txt").write_text("\n".join(lines) + "\n")

    cfg = tiny_config(mel_bins=8)
    tok = CharTokenizer()
    sidecar = tmp_path / "sidecar"
    sidecar.mkdir()
    cfg = cfg.replace(vocab_size=tok.vocab_size, token_type="character")
    cfg.save(str(sidecar))
    tok.save(str(sidecar))

    serial = list(pipeline.preprocess_corpus(
        librispeech.load_dataset(str(root), ["mini"]), tok, cfg,
        max_length_seconds=1.0))
    # Poison the inherited platform pin the way a TPU-tunnel launch env does
    # (JAX_PLATFORMS names a plugin the workers can't register): workers must
    # force cpu instead of dying at their first jax op, and the parent's env
    # must come back untouched.  Regression for the --workers crash under
    # JAX_PLATFORMS=axon.
    import os as os_mod
    saved = os_mod.environ.get("JAX_PLATFORMS")
    os_mod.environ["JAX_PLATFORMS"] = "nonexistent_tpu_plugin"
    try:
        par = list(pipeline.preprocess_corpus_parallel(
            librispeech.iter_utterance_files(str(root), ["mini"]),
            str(sidecar), cfg, workers=2, max_length_seconds=1.0))
        assert os_mod.environ.get("JAX_PLATFORMS") == "nonexistent_tpu_plugin"
    finally:
        if saved is None:
            os_mod.environ.pop("JAX_PLATFORMS", None)
        else:
            os_mod.environ["JAX_PLATFORMS"] = saved
    assert len(serial) == len(par) and len(serial) > 0
    for a, b in zip(serial, par):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
