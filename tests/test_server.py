"""HTTP serving front-end: end-to-end over a real socket on a tiny model.

The reference has no serving layer (chat/base.py is an interactive REPL);
these tests pin down the new surface: JSON generate, SSE streaming,
health, and concurrent clients multiplexed onto fewer slots.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.inference.continuous import ContinuousBatcher
from fastmax_tpu.inference.engine import InferenceEngine
from fastmax_tpu.inference.server import Server


class FakeTokenizer:
    """Maps token id <-> 'tNN ' text so decode deltas are deterministic."""

    eos_id = None

    def encode(self, text):
        return [int(t[1:]) for t in text.split()]

    def decode(self, ids):
        return " ".join(f"t{int(i)}" for i in np.asarray(ids).reshape(-1))


@pytest.fixture(scope="module")
def served():
    cfg = Config(
        name="srv-tiny", block_size=128, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    batcher = ContinuousBatcher(cfg, params, n_slots=2, max_seq_length=128)
    server = Server(batcher, FakeTokenizer(), port=0, model_name=cfg.name).start()
    yield cfg, params, server
    server.stop()


def _post(port, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def reference_greedy(cfg, params, prompt, n_new):
    eng = InferenceEngine(cfg, params, max_seq_length=128, batch_size=1)
    out = eng.generate(jnp.asarray(prompt), len(prompt) + n_new, temperature=0.0,
                       key=jax.random.PRNGKey(9))
    return np.asarray(out[0, len(prompt):]).tolist()


def test_generate_matches_engine(served):
    cfg, params, server = served
    prompt = list(range(1, 11))
    want = reference_greedy(cfg, params, prompt, 12)
    resp = json.load(_post(server.port, {"prompt": prompt, "max_new_tokens": 12}))
    assert resp["tokens"] == want
    assert resp["prompt_tokens"] == 10
    assert resp["finish_reason"] == "length"
    assert resp["text"] == FakeTokenizer().decode(want)


def test_text_prompt_and_health(served):
    cfg, params, server = served
    want = reference_greedy(cfg, params, [3, 4, 5], 4)
    resp = json.load(_post(server.port, {"prompt": "t3 t4 t5", "max_new_tokens": 4}))
    assert resp["tokens"] == want

    health = json.load(urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/v1/health", timeout=30))
    assert health["status"] == "ok"
    assert health["model"] == "srv-tiny"
    assert health["n_slots"] == 2


def test_eos_stop(served):
    cfg, params, server = served
    prompt = list(range(1, 11))
    ref = reference_greedy(cfg, params, prompt, 20)
    eos = ref[4]
    resp = json.load(_post(server.port,
                           {"prompt": prompt, "max_new_tokens": 20, "eos_id": eos}))
    assert resp["finish_reason"] == "stop"
    assert resp["tokens"] == ref[:5]
    # eos itself is not detokenized into the text
    assert resp["text"] == FakeTokenizer().decode(ref[:4])


def test_streaming_sse(served):
    cfg, params, server = served
    prompt = list(range(20, 28))
    want = reference_greedy(cfg, params, prompt, 8)
    conn = _post(server.port, {"prompt": prompt, "max_new_tokens": 8, "stream": True})
    assert conn.headers["Content-Type"].startswith("text/event-stream")
    events, text = [], ""
    for raw in conn:
        line = raw.decode().strip()
        if not line.startswith("data: "):
            continue
        data = line[len("data: "):]
        if data == "[DONE]":
            break
        ev = json.loads(data)
        events.append(ev)
        text += ev["text"]
    got = [t for ev in events for t in ev["token_ids"]]
    assert got == want
    assert text == FakeTokenizer().decode(want)


def test_concurrent_clients_share_slots(served):
    """4 clients on 2 slots: every client gets its own solo-run tokens."""
    cfg, params, server = served
    prompts = [list(range(1, 6)), list(range(10, 17)),
               [5, 50, 7], list(range(30, 40))]
    want = [reference_greedy(cfg, params, p, 6) for p in prompts]
    got = [None] * len(prompts)

    def worker(i):
        resp = json.load(_post(server.port,
                               {"prompt": prompts[i], "max_new_tokens": 6}))
        got[i] = resp["tokens"]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert got == want


def test_bad_request_is_400(served):
    _, _, server = served
    try:
        _post(server.port, {"max_new_tokens": 4})
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
