"""Driver-contract pins for bench.py's survivability machinery.

The one non-negotiable: bench.py always prints exactly ONE parseable
JSON line with metric/value/unit/vs_baseline, whatever the backend is
doing (round-1 regressed on exactly this: rc=124, no line)."""

import importlib.util
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", __file__.rsplit("/tests/", 1)[0] + "/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_degraded_uses_cached_chip_number(tmp_path, capsys,
                                               monkeypatch):
    bench = _load_bench()
    cached = {"metric": "full_report_throughput_1080p", "value": 321.5,
              "unit": "MP/s", "vs_baseline": 268.0, "platform": "tpu",
              "pallas": True}
    p = tmp_path / "BENCH_LAST_GOOD.json"
    p.write_text(json.dumps(cached))
    monkeypatch.setattr(bench, "LAST_GOOD", str(p))
    bench.emit_degraded("tunnel died")
    line = capsys.readouterr().out.strip()
    out = json.loads(line)
    assert out["value"] == 321.5 and out["degraded"] == "tunnel died"
    assert out["platform"] == "tpu"


def test_emit_degraded_without_cache_still_emits(tmp_path, capsys,
                                                 monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "LAST_GOOD", str(tmp_path / "missing.json"))
    bench.emit_degraded("nothing cached")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["metric"] == "full_report_throughput_1080p"
    assert out["value"] == 0.0 and out["degraded"] == "nothing cached"


def test_cache_result_rejects_cpu(tmp_path, monkeypatch):
    bench = _load_bench()
    p = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_GOOD", str(p))
    bench._cache_result({"metric": "m", "value": 1.0, "platform": "cpu"})
    assert not p.exists(), "a CPU number must never masquerade as last-good"
    bench._cache_result({"metric": "m", "value": 2.0, "platform": "tpu"})
    assert json.loads(p.read_text())["value"] == 2.0
