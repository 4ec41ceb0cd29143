"""Checkpoint/resume and multi-host sharding tests for the corpus driver.

The reference has no persistence at all (SURVEY.md §5.4 — its only durable
outputs are text dumps, src/utilities.c:229); the resumable corpus driver
is this framework's replacement.  Pinned here:

  * kill-and-resume: a crash mid-stream leaves JSONL lines the watermark
    doesn't know about (reports are written before the watermark
    advances); re-running must not duplicate them and must complete the
    corpus (exactly-once output);
  * torn trailing line: a partial final line from a crash mid-write is
    truncated on resume;
  * ``num_hosts=2`` partitioning: per-host key sets are disjoint and
    cover the corpus;
  * corrupt inputs are skipped, not fatal.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from photohive_dsp_tpu import ReportConfig
from photohive_dsp_tpu.utils import io as phio

from .util import structured_image

CFG = ReportConfig()
N_IMAGES = 6


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Six small PNG images (same shape: one compile)."""
    from PIL import Image

    d = tmp_path_factory.mktemp("corpus")
    paths = []
    for i in range(N_IMAGES):
        img = (structured_image(400, 520, seed=i) * 255).round()
        hwc = np.moveaxis(img, 0, -1).astype(np.uint8)
        p = str(d / f"img_{i}.png")
        Image.fromarray(hwc).save(p)
        paths.append(p)
    return paths


def _shard_lines(out_dir, host_id=0):
    path = os.path.join(out_dir, f"reports.{host_id}.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_kill_and_resume_exactly_once(corpus, tmp_path, monkeypatch):
    out_dir = str(tmp_path / "out")
    real_run_corpus = phio.run_corpus

    def crashing(images, cfg, mesh=None, batch_size=32):
        it = real_run_corpus(images, cfg, mesh=mesh, batch_size=batch_size)
        for n, item in enumerate(it):
            yield item
            if n == 2:
                raise RuntimeError("simulated preemption")

    monkeypatch.setattr(phio, "run_corpus", crashing)
    with pytest.raises(RuntimeError):
        phio.process_corpus(corpus, out_dir, CFG, batch_size=2,
                            flush_every=2)

    # 3 reports written, but only the first flush (2 keys) watermarked:
    # the third line sits in the at-least-once window.
    lines = _shard_lines(out_dir)
    assert len(lines) == 3
    with open(os.path.join(out_dir, "watermark.0")) as f:
        wm = {ln.strip() for ln in f if ln.strip()}
    assert len(wm) == 2

    monkeypatch.setattr(phio, "run_corpus", real_run_corpus)
    n = phio.process_corpus(corpus, out_dir, CFG, batch_size=2,
                            flush_every=2)
    assert n == N_IMAGES - 3  # only the unfinished images re-run

    lines = _shard_lines(out_dir)
    keys = [ln["key"] for ln in lines]
    assert len(keys) == N_IMAGES
    assert len(set(keys)) == N_IMAGES, "duplicate report lines after resume"
    assert set(keys) == set(corpus)
    for ln in lines:
        assert len(ln["report"]) == 439  # full fixed schema per line

    # a third run is a no-op
    assert phio.process_corpus(corpus, out_dir, CFG, batch_size=2) == 0


def test_torn_trailing_line_recovery(tmp_path):
    shard = str(tmp_path / "reports.0.jsonl")
    with open(shard, "w") as f:
        f.write(json.dumps({"key": "a", "report": {}}) + "\n")
        f.write(json.dumps({"key": "b", "report": {}}) + "\n")
        f.write('{"key": "c", "repo')  # crash mid-write
    keys = phio._recover_shard(shard)
    assert keys == {"a", "b"}
    with open(shard, "rb") as f:
        data = f.read()
    assert data.endswith(b"\n") and b'"c"' not in data


def test_host_sharding_disjoint_and_covering(corpus, tmp_path):
    out_dir = str(tmp_path / "out")
    n0 = phio.process_corpus(corpus, out_dir, CFG, batch_size=2,
                             num_hosts=2, host_id=0)
    n1 = phio.process_corpus(corpus, out_dir, CFG, batch_size=2,
                             num_hosts=2, host_id=1)
    assert n0 + n1 == N_IMAGES
    keys0 = {ln["key"] for ln in _shard_lines(out_dir, 0)}
    keys1 = {ln["key"] for ln in _shard_lines(out_dir, 1)}
    assert keys0.isdisjoint(keys1)
    assert keys0 | keys1 == set(corpus)


def test_corrupt_input_skipped(corpus, tmp_path):
    bad = str(tmp_path / "broken.png")
    with open(bad, "w") as f:
        f.write("not a png")
    out_dir = str(tmp_path / "out")
    n = phio.process_corpus([corpus[0], bad, corpus[1]], out_dir, CFG,
                            batch_size=2)
    assert n == 2
    keys = {ln["key"] for ln in _shard_lines(out_dir)}
    assert keys == {corpus[0], corpus[1]}
    # the skip is recorded durably, with the error...
    with open(os.path.join(out_dir, "skipped.0.jsonl")) as f:
        skipped = [json.loads(line) for line in f]
    assert [s["key"] for s in skipped] == [bad] and skipped[0]["error"]
    # ...and a resumed run does not re-decode (or re-log) the corrupt file
    n2 = phio.process_corpus([corpus[0], bad, corpus[1]], out_dir, CFG,
                             batch_size=2)
    assert n2 == 0
    with open(os.path.join(out_dir, "skipped.0.jsonl")) as f:
        assert len(f.readlines()) == 1


def test_prefetch_iter_order_and_exceptions():
    """prefetch_iter yields the exact sequence and re-raises producer
    exceptions at the consumer."""
    assert list(phio.prefetch_iter(iter(range(100)), 8)) == list(range(100))
    assert list(phio.prefetch_iter(iter([]), 4)) == []
    # 2-tuples (the corpus item shape) are not mistaken for the sentinel
    items = [(f"k{i}", i) for i in range(10)]
    assert list(phio.prefetch_iter(iter(items), 3)) == items

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = phio.prefetch_iter(boom(), 2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_process_corpus_with_prefetch_matches(corpus, tmp_path):
    """Decode-ahead prefetching changes timing only, not output."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    na = phio.process_corpus(corpus, out_a, cfg=CFG, batch_size=4,
                             prefetch=0)
    nb = phio.process_corpus(corpus, out_b, cfg=CFG, batch_size=4,
                             prefetch=8)
    assert na == nb == N_IMAGES
    la = {l["key"]: l["report"] for l in _shard_lines(out_a)}
    lb = {l["key"]: l["report"] for l in _shard_lines(out_b)}
    assert la == lb


def test_parallel_map_iter_order_exceptions_laziness():
    calls = []

    def f(x):
        calls.append(x)
        if x == 7:
            raise ValueError("item 7")
        return x * 2

    assert list(phio.parallel_map_iter(f, range(6), 4, 8)) == \
        [0, 2, 4, 6, 8, 10]
    out = []
    with pytest.raises(ValueError, match="item 7"):
        for y in phio.parallel_map_iter(f, range(10), 3, 4):
            out.append(y)
    assert out == [0, 2, 4, 6, 8, 10, 12]  # order held up to the failure
    # workers<=1 degenerates to plain map
    assert list(phio.parallel_map_iter(lambda x: x + 1, range(5), 1, 4)) == \
        [1, 2, 3, 4, 5]
    # laziness: an infinite source only advances ~depth ahead
    import itertools
    seen = []

    def g(x):
        seen.append(x)
        return x

    it = phio.parallel_map_iter(g, itertools.count(), 2, 3)
    assert [next(it) for _ in range(5)] == [0, 1, 2, 3, 4]
    assert max(seen) <= 5 + 3


def test_process_corpus_decode_workers_match(corpus, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    na = phio.process_corpus(corpus, out_a, cfg=CFG, batch_size=4,
                             decode_workers=1)
    nb = phio.process_corpus(corpus, out_b, cfg=CFG, batch_size=4,
                             decode_workers=4)
    assert na == nb == N_IMAGES
    la = {l["key"]: l["report"] for l in _shard_lines(out_a)}
    lb = {l["key"]: l["report"] for l in _shard_lines(out_b)}
    assert la == lb
