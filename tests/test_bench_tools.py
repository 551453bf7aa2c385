"""The benchmark harnesses (training MFU, scaling efficiency) must run on
the CI virtual mesh and report sane numbers."""

import jax


def test_bench_mfu_runs():
    from fastmax_tpu.training.bench_mfu import run

    out = run(model_name="pythia-14m", seq_len=64,
              micro_batch=len(jax.devices()), iters=2)
    assert out["devices"] == len(jax.devices())
    assert out["tokens_per_sec"] > 0
    # on the CPU CI mesh mfu is computed against the TPU peak and rounds
    # to ~0; just bound it
    assert 0 <= out["mfu"] < 1
    assert out["loss"] > 0


def test_scaling_bench_runs(capsys):
    from fastmax_tpu.parallel.scaling_bench import run

    res = run(model_name="pythia-14m", seq_len=64, per_device_batch=1, max_devices=2)
    assert 1 in res and 2 in res
    for r in res.values():
        assert r["tokens_per_sec"] > 0 and r["step_time_s"] > 0
    assert res[1]["efficiency"] == 1.0


def test_bench_serving_closed_and_open_loop(capsys):
    """The serving benchmark drives a tiny model through both load shapes
    and reports coherent numbers (all tokens generated, sane percentiles)."""
    from fastmax_tpu.inference.bench_serving import run

    res = run(model_name="pythia-14m", precision="float32", n_slots=2,
              n_requests=4, prompt_len=8, max_new_tokens=6)
    assert res["n_requests"] == 4
    assert res["generated_tokens"] == 4 * 6
    assert res["aggregate_tok_s"] > 0
    assert res["ttft_p50_ms"] <= res["ttft_p95_ms"] * 1.0001
    assert res["latency_p50_s"] <= res["latency_p95_s"] * 1.0001

    res2 = run(model_name="pythia-14m", precision="float32", n_slots=2,
               n_requests=3, prompt_len=8, max_new_tokens=4,
               arrival_rate=50.0, decode_quantum=2)
    assert res2["generated_tokens"] == 3 * 4
    out = capsys.readouterr().out
    assert '"metric": "serving_aggregate_decode"' in out
