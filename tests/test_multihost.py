"""Multi-host (DCN) training: real cross-process collectives.

The reference has no distributed story at all (SURVEY.md §2.3). These tests
spawn genuinely separate processes, each exposing its own virtual CPU
devices, joined through jax.distributed + gloo collectives — the same code
path a TPU pod uses over DCN (parallel/multihost.py). Asserts:

- both hosts finish and report the SAME losses (the computation is global);
- replicated params stay bit-identical across hosts (checksum probe);
- the multi-host run matches a single-process DP run of the same global
  batch (same seed) — host-sharded feeding changes nothing numerically.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
        " --xla_backend_optimization_level=0")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _train_cmd(extra):
    return [sys.executable, "-m", "freeze_omni_tpu.bin.train",
            "--preset", "tiny", "--stage", "state", "--steps", "3",
            "--batch", "8", "--seed", "7"] + extra


def _summary(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no summary JSON in output:\n{stdout}")


def test_two_host_dp_matches_single_process():
    port = _free_port()
    env = _child_env(2)  # 2 hosts x 2 devices = 4-device global 'data' mesh
    procs = [
        subprocess.Popen(
            _train_cmd(["--coordinator", f"127.0.0.1:{port}",
                        "--num_hosts", "2", "--host_id", str(i)]),
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"host {i} failed:\n{err[-4000:]}"
        outs.append((out, err))

    s0, s1 = _summary(outs[0][0]), _summary(outs[1][0])
    assert {s0["host_id"], s1["host_id"]} == {0, 1}
    # the computation is global: every host observes the same losses and
    # ends with bit-identical replicated params
    assert s0["final_step"] == s1["final_step"] == 3
    assert s0["first_loss"] == s1["first_loss"]
    assert s0["final_loss"] == s1["final_loss"]
    assert s0["param_checksum"] == s1["param_checksum"]
    assert np.isfinite(s0["final_loss"])

    # single-process DP over the same 4-device 'data' extent, same seed and
    # global batch — host-sharded feeding must be numerically invisible
    single = subprocess.run(_train_cmd([]), cwd=REPO, env=_child_env(4),
                            capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-4000:]
    ss = _summary(single.stdout)
    assert ss["final_step"] == 3
    np.testing.assert_allclose(ss["first_loss"], s0["first_loss"], rtol=1e-4)
    np.testing.assert_allclose(ss["final_loss"], s0["final_loss"], rtol=1e-3)


def test_global_mesh_rejects_cross_host_tp():
    """model_par may not straddle hosts: the guard must fire before any
    collective is built."""
    import pytest

    from freeze_omni_tpu.parallel import multihost as mh

    # single-process here: per-host device count == all visible devices (8
    # from conftest); 16 cannot divide into one host
    with pytest.raises(ValueError, match="straddle"):
        mh.make_global_mesh(("data", "model"), model_par=16)


def test_lockstep_serving_matches_single_process():
    """Multi-host serving (runtime/multihost_serving.py): a 2-host x 2-device
    global mesh serves the same chunk schedule as a single-process engine —
    KV rows sharded over hosts, LLM TP inside each host, one broadcast per
    step. Asserts the hosts' KV-length mirrors agree (lockstep never
    diverged) and the primary's predictions match the single-process run."""
    port = _free_port()
    env = _child_env(2)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "_multihost_serving_child.py"),
             f"127.0.0.1:{port}", str(i)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"host {i} failed:\n{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["host_id"]] = r

    # lockstep: both hosts' host-side KV mirrors evolved identically
    assert results[0]["len_host"] == results[1]["len_host"]

    # ground truth: the same schedule on a plain single-process engine
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _multihost_serving_child as child
    from freeze_omni_tpu.runtime.engine import ServingEngine

    scfg = child.tiny_serving_cfg()
    single = child.drive(ServingEngine(scfg, seed=0),
                         child.tiny_tts_params(scfg))
    # the deliberate overflow raised on the primary AND the follower stayed
    # alive to serve tick3 (a dead follower would hang the broadcast and trip
    # the communicate timeout above)
    assert results[0]["overflow"] == "raised" == single["overflow"]
    for tick in ("tick1", "tick2", "tick3"):
        got, want = results[0][tick], single[tick]
        assert set(got) == {str(k) for k in want}
        for slot, pred in want.items():
            for k in ("state_1", "state_2"):
                np.testing.assert_allclose(got[str(slot)][k], pred[k],
                                           atol=2e-4)
    assert results[0]["cont_tokens"] == {
        s: t for s, t in single["cont_tokens"].items()}
    # migration (export -> close -> import -> tick) matches single-process
    for k in ("state_1", "state_2"):
        np.testing.assert_allclose(results[0]["migrated"][k],
                                   single["migrated"][k], atol=2e-4)
    # full speech-to-speech lockstep: fast-response text tokens match the
    # single-process run exactly; PCM and the re-embed collective agree
    assert results[0]["resp_tokens"] == single["resp_tokens"]
    for s, v in single["resp_pcm_sum"].items():
        np.testing.assert_allclose(results[0]["resp_pcm_sum"][s], v,
                                   rtol=1e-4)
    np.testing.assert_allclose(results[0]["embed_sum"], single["embed_sum"],
                               rtol=1e-5)
