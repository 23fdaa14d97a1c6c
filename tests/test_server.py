"""Tests for the HTTP inference server (stain2stain_tpu/server.py)."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.server import TranslationServer, serve_forever


@pytest.fixture(scope="module")
def server():
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training.optim import Adam

    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
    )
    task = ConditionalFlowMatchingModule(
        net=net, optimizer=lambda: Adam(lr=1e-3), solver=SolverConfig("euler")
    )
    variables = task.init_variables(
        jax.random.key(0), (jnp.zeros((2, 16, 16, 3), jnp.float32),)
    )
    return TranslationServer(task, variables, num_steps=2, tile=16, overlap=4, batch=2)


def test_class_conditioned_server_one_program_all_classes():
    """any2any serving: target_class is a traced scalar, so switching the
    target stain per request reuses one compiled program and changes the
    output."""
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ClassConditionalFlowMatchingModule
    from stain2stain_tpu.training.optim import Adam

    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1, class_cond=True, num_classes=3,
    )
    task = ClassConditionalFlowMatchingModule(
        net=net, num_classes=3, optimizer=lambda: Adam(lr=1e-3),
        solver=SolverConfig("euler"),
    )
    variables = task.init_variables(
        jax.random.key(0),
        (jnp.zeros((2, 16, 16, 3), jnp.float32), jnp.zeros((2, 16, 16, 3), jnp.float32),
         jnp.zeros((2,), jnp.int32)),
    )
    # ADM zero-inits the output conv, so an untrained net has v == 0 for every
    # class; jitter the params so the velocity field is class-dependent.
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(7), len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    variables = {**variables, "params": jax.tree_util.tree_unflatten(treedef, leaves)}
    # conditioning is auto-detected from net.class_cond — no default needed
    srv = TranslationServer(task, variables, num_steps=2, tile=16, overlap=4, batch=2)
    assert srv.conditioned and srv.default_class == 0
    img = np.random.default_rng(1).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out0 = srv.translate(img)                  # default class 0
    out2 = srv.translate(img, target_class=2)  # per-request override
    assert out0.shape == out2.shape == (24, 24, 3)
    assert not np.allclose(out0, out2), "different target stains must differ"


def test_translate_arbitrary_size(server):
    img = np.random.default_rng(0).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    out = server.translate(img)
    assert out.shape == (40, 56, 3)
    assert out.dtype == np.float32
    assert (out >= 0).all() and (out <= 1).all()
    assert server.requests_served >= 1


def test_translate_rejects_bad_shape(server):
    with pytest.raises(ValueError):
        server.translate(np.zeros((40, 56), np.uint8))


def test_unconditioned_server_rejects_target_class(server):
    assert not server.conditioned
    with pytest.raises(ValueError, match="not class-conditioned"):
        server.translate(
            np.zeros((20, 20, 3), np.uint8), target_class=1
        )
    with pytest.raises(ValueError, match="not class-conditioned"):
        TranslationServer(
            server.task, None, num_steps=2, tile=16, overlap=4, batch=2,
            target_class=1,
        )


def test_translate_rejects_oversized_image(server):
    server_cap = server.max_pixels
    try:
        server.max_pixels = 16 * 16
        with pytest.raises(ValueError, match="pixel serving cap"):
            server.translate(np.zeros((32, 32, 3), np.uint8))
    finally:
        server.max_pixels = server_cap


def test_concurrent_requests_serialize_cleanly(server):
    imgs = [
        np.random.default_rng(i).integers(0, 256, (24, 24, 3), dtype=np.uint8)
        for i in range(4)
    ]
    results = [None] * 4

    def work(i):
        results[i] = server.translate(imgs[i])

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    for r in results:
        assert r is not None and r.shape == (24, 24, 3) and np.isfinite(r).all()


def test_http_round_trip(server):
    """Full socket path: POST a PNG, get the translated PNG back; /healthz
    and /info respond. (The CLI src/serve.py is this loop + ckpt loading.)"""
    from PIL import Image

    ready = threading.Event()
    t = threading.Thread(
        target=serve_forever,
        kwargs=dict(server=server, host="127.0.0.1", port=0, ready_event=ready),
        daemon=True,  # ThreadingHTTPServer has no clean cross-thread shutdown here
    )
    t.start()
    assert ready.wait(timeout=30)
    base = f"http://127.0.0.1:{server.bound_port}"

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert r.status == 200 and r.read() == b"ok"
    with urllib.request.urlopen(f"{base}/info", timeout=30) as r:
        info = json.loads(r.read())
        assert info["tile"] == 16 and info["num_steps"] == 2

    img = np.random.default_rng(3).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(
        f"{base}/translate", data=buf.getvalue(),
        headers={"Content-Type": "image/png"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        out = np.asarray(Image.open(io.BytesIO(r.read())))
    assert out.shape == (20, 30, 3)

    # malformed body -> 400, server stays alive
    bad = urllib.request.Request(
        f"{base}/translate", data=b"not an image",
        headers={"Content-Type": "image/png"}, method="POST",
    )
    try:
        urllib.request.urlopen(bad, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised

    # non-uint8 npy -> 400 (a silent cast would produce 0/1 garbage)
    fbuf = io.BytesIO()
    np.save(fbuf, np.zeros((8, 8, 3), np.float32))
    badnpy = urllib.request.Request(
        f"{base}/translate", data=fbuf.getvalue(),
        headers={"Content-Type": "application/x-npy"}, method="POST",
    )
    try:
        urllib.request.urlopen(badnpy, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400 and b"uint8" in e.read()
    assert raised

    # oversized body -> 413 before any decode work
    server.max_body_bytes = 64
    try:
        big = urllib.request.Request(
            f"{base}/translate", data=b"x" * 256,
            headers={"Content-Type": "image/png"}, method="POST",
        )
        try:
            urllib.request.urlopen(big, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 413
        assert raised
    finally:
        server.max_body_bytes = 64 << 20

    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert r.status == 200
