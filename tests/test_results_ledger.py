"""Results ledger tests."""

import json

from guidedquant_tpu.evaluate.results import (
    record_result, has_result, load_results)


def test_ledger_merge_and_sort(tmp_path):
    path = str(tmp_path / "results.json")
    record_result(path, "model-b", "ppl", "wikitext2", "4", 6.1)
    record_result(path, "model-a", "ppl", "wikitext2", "2", 9.9)
    record_result(path, "model-b", "ppl", "c4", "4", 8.2)
    record_result(path, "model-b", "lm-eval", "arc_easy", "acc", 0.7)
    r = load_results(path)
    assert list(r.keys()) == ["model-a", "model-b"]
    assert r["model-b"]["ppl"]["wikitext2"]["4"] == 6.1
    assert r["model-b"]["ppl"]["c4"]["4"] == 8.2
    assert has_result(path, "model-b", "ppl", "c4", "4")
    assert not has_result(path, "model-b", "ppl", "c4", "2")
    # overwrite merges
    record_result(path, "model-b", "ppl", "c4", "4", 8.0)
    assert load_results(path)["model-b"]["ppl"]["c4"]["4"] == 8.0


def test_cli_imports():
    import importlib.util
    for mod in ("quantize", "layerwise_nuq", "run_eval",
                "inference_example", "qtip_quantize", "spinquant_ptq",
                "full_nuq"):
        spec = importlib.util.spec_from_file_location(mod, f"{mod}.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        assert hasattr(m, "main")


def test_profiling_utils():
    import jax.numpy as jnp
    from guidedquant_tpu.utils import profiling
    oh = profiling.measure_dispatch_overhead()
    assert oh >= 0
    out, t = profiling.timed(lambda x: x * 2, jnp.ones((8, 8)))
    assert t >= 0
    stats = profiling.log_memory("test")
    assert isinstance(stats, dict)
    from guidedquant_tpu.models import get_config
    m = profiling.decode_metrics(get_config("llama-3.1-8b"), 100.0, 2.0)
    assert m["achieved_GBps"] > 0 and m["achieved_TFLOPS"] > 0
