"""Multi-process distributed parity: 2 real processes x 4 virtual devices
must reproduce the single-process 8-device sharded TDM run exactly.

This exercises the code paths the reference never had (SURVEY.md §2.8 —
no distributed backend exists there): jax.distributed bring-up,
host-0-broadcast index artifacts, per-host input shards, cross-process
collectives in the sharded train step, and full-param gather.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "scripts", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_processes, out_path, steps=4, local_devices=4):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = []
    for pid in range(num_processes):
        cmd = [
            sys.executable, WORKER,
            "--process-id", str(pid),
            "--num-processes", str(num_processes),
            "--coordinator", f"127.0.0.1:{port}",
            "--local-devices", str(local_devices),
            "--steps", str(steps),
        ]
        if pid == 0:
            cmd += ["--out", out_path]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    return outs


@pytest.mark.skipif(
    os.environ.get("DISMEMBER_SKIP_MULTIPROC") == "1",
    reason="multi-process run disabled",
)
def test_two_process_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the reference run")

    from dismember_tpu.train.multiproc import run_tdm_steps

    steps = 4
    ref = run_tdm_steps(steps=steps)  # single-process, 8 devices

    out_path = str(tmp_path / "mp.npz")
    outs = _run_workers(2, out_path, steps=steps)
    assert os.path.exists(out_path), f"no output written:\n{outs[0]}"
    got = np.load(out_path)

    np.testing.assert_allclose(
        got["losses"], np.asarray(ref["losses"]), rtol=1e-6, atol=1e-7
    )

    # sharded serving parity: identical top items + scores across layouts
    np.testing.assert_array_equal(got["beam_ids"], np.asarray(ref["beam_ids"]))
    np.testing.assert_allclose(
        got["beam_scores"], np.asarray(ref["beam_scores"]), rtol=1e-6, atol=1e-7
    )

    leaves, _ = jax.tree_util.tree_flatten_with_path(ref["params"])
    compared = 0
    for path, leaf in leaves:
        key = "param:" + jax.tree_util.keystr(path)
        assert key in got, f"missing {key}"
        np.testing.assert_allclose(
            got[key], np.asarray(leaf), rtol=1e-6, atol=1e-7,
            err_msg=f"mismatch at {key}",
        )
        compared += 1
    assert compared >= 3  # embedding + mlp weights at minimum


@pytest.mark.skipif(
    os.environ.get("DISMEMBER_SKIP_MULTIPROC") == "1",
    reason="multi-process run disabled",
)
def test_two_process_deep_serving_matches_single_process(tmp_path):
    """Deep-serving leg across a real process boundary: the packed/hybrid
    beam with its pair table row-sharded on 'model' (2^14-item tree, so
    cross-process table-shard gathers carry real traffic), plus the sharded
    DR pmv E-step and block serving — all must match the single-process run
    of the same SPMD program."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the reference run")

    from dismember_tpu.train.multiproc import run_deep_serving

    ref = run_deep_serving()  # single-process, 8 devices

    out_path = str(tmp_path / "mp_deep.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, WORKER,
            "--process-id", str(pid),
            "--num-processes", "2",
            "--coordinator", f"127.0.0.1:{port}",
            "--local-devices", "4",
            "--mode", "deep",
        ]
        if pid == 0:
            cmd += ["--out", out_path]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"deep worker failed:\n{out}"
    got = np.load(out_path)

    np.testing.assert_array_equal(got["packed_ids"], ref["packed_ids"])
    np.testing.assert_allclose(
        got["packed_scores"], ref["packed_scores"], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        got["dr_layer_losses"], ref["dr_layer_losses"], rtol=1e-6
    )
    np.testing.assert_allclose(
        float(got["dr_rerank_loss"]), ref["dr_rerank_loss"], rtol=1e-6
    )
    np.testing.assert_array_equal(got["dr_ids"], ref["dr_ids"])
    np.testing.assert_allclose(
        got["dr_scores"], ref["dr_scores"], rtol=1e-5, atol=1e-6
    )
