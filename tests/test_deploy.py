"""Deployment artifacts: export the AOT sampler via jax.export, load it back
without model code, and get bit-identical images.

Reference anchor: the reference has no deployment path beyond pickled torch
checkpoints (Utils/training.py:236-249); hdmoe_tpu.deploy is the TPU-native
replacement (compiled StableHLO program, folded weights baked as constants).
"""

import json
import subprocess
import sys
import zipfile

import jax
import numpy as np
import pytest

from hdmoe_tpu.deploy import ExportedSampler, export_sampler, load_sampler
from hdmoe_tpu.models import precond_init
from hdmoe_tpu.serve import SamplerEngine
from tests.test_model import tiny_cfg


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    return SamplerEngine(cfg, params, batch=4, num_steps=2)


@pytest.fixture(scope="module")
def artifact(engine, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("deploy") / "tiny.hdmoe")
    meta = export_sampler(engine, path)
    return path, meta


def test_export_writes_selfcontained_zip(artifact):
    path, meta = artifact
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert names == {"meta.json", "sampler.bin"}
        stored = json.loads(z.read("meta.json"))
    assert stored == meta
    assert meta["batch"] == 4 and meta["num_steps"] == 2
    assert meta["decode_included"] is True
    # tiny_cfg has no Pallas in the compiled path -> portable export
    assert "cpu" in meta["platforms"]


def test_loaded_artifact_matches_engine_bitwise(engine, artifact):
    """The exported program is the engine's own computation: same prompts,
    same seed => identical uint8 images (constants baked, no re-init)."""
    path, _ = artifact
    sampler = load_sampler(path)
    assert sampler.batch == engine.batch
    prompts = ["a flower", "a rose"]
    np.testing.assert_array_equal(
        sampler.sample(prompts, seed=3), engine.sample(prompts, seed=3)
    )


def test_loaded_artifact_coalescing_contract(engine, artifact):
    """ExportedSampler shares the request-assembly semantics, so a request's
    images are independent of its batch-mates (BatchingFrontend-compatible)."""
    path, _ = artifact
    sampler = load_sampler(path)
    solo = sampler.sample(["a tulip"], seed=11)
    both = sampler.sample_coalesced([(["a flower"], 5), (["a tulip"], 11)])
    np.testing.assert_array_equal(both[1], solo)

    from hdmoe_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(sampler)
    np.testing.assert_array_equal(fe.submit(["a tulip"], seed=11), solo)


def test_load_in_fresh_process_without_model_code(engine, artifact, tmp_path):
    """The artifact runs in a process that never builds the model: only
    deploy.load_sampler + the recorded adapter kinds."""
    path, _ = artifact
    expected = engine.sample(["a flower"], seed=9)
    out_npy = str(tmp_path / "imgs.npy")
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORM_NAME'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_default_matmul_precision', 'highest')\n"
        "import numpy as np\n"
        "from hdmoe_tpu.deploy import load_sampler\n"
        f"s = load_sampler({path!r})\n"
        f"np.save({out_npy!r}, s.sample(['a flower'], seed=9))\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=600)
    np.testing.assert_array_equal(np.load(out_npy), expected)


def test_mesh_engine_refuses_export(engine):
    e = SamplerEngine.__new__(SamplerEngine)
    e.mesh = object()
    with pytest.raises(ValueError, match="single-device"):
        export_sampler(e, "/dev/null")


def test_wrong_backend_artifact_rejected(engine, artifact, tmp_path):
    """An artifact lowered only for another platform fails loudly at load."""
    path, _ = artifact
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        blob = z.read("sampler.bin")
    meta["platforms"] = ["tpu"]
    bad = str(tmp_path / "bad.hdmoe")
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("meta.json", json.dumps(meta))
        z.writestr("sampler.bin", blob)
    with pytest.raises(ValueError, match="exported for"):
        ExportedSampler(bad)


def test_loaded_artifact_through_pipelined_frontend(engine, artifact):
    """ExportedSampler implements the staged dispatch/fetch API, so the
    default (pipelined) BatchingFrontend serves artifacts unchanged —
    regression for the frontend's engine-interface widening."""
    import numpy as np

    from hdmoe_tpu.serve import BatchingFrontend

    path, _ = artifact
    sampler = load_sampler(path)
    staged = sampler.fetch_dispatched(sampler.dispatch_coalesced([(["p"], 5)]))
    np.testing.assert_array_equal(staged[0], sampler.sample(["p"], seed=5))

    fe = BatchingFrontend(sampler, pipeline=True)
    for s in (1, 2):
        np.testing.assert_array_equal(fe.submit(["p"], seed=s),
                                      sampler.sample(["p"], seed=s))


def test_precompiled_artifact_loads_without_compile_and_matches(engine, tmp_path):
    """precompile=True embeds the compiled executable; the loader boots from
    it (loaded_precompiled=True) and the images match the live engine.

    This test runs under the suite's forced-8-virtual-device env, where
    jax's deserialize_and_load rehydrates a 1-device executable with an
    all-local-devices assignment and fails AT EXECUTION — exactly the class
    of environment mismatch the loader's guarded first call exists for. So
    the contract asserted here: boot prefers the precompiled path, the
    first call either serves from it or transparently falls back, and the
    images are correct either way. The strict single-device precompiled
    serve (no fallback) is asserted in
    test_precompiled_strict_single_device below."""
    path = str(tmp_path / "pre.hdmoe")
    meta = export_sampler(engine, path, precompile=True)
    assert meta["precompiled_backend"] == jax.default_backend()
    with zipfile.ZipFile(path) as z:
        assert f"exec_{jax.default_backend()}.pkl" in z.namelist()
    sampler = load_sampler(path)
    assert sampler.loaded_precompiled is True  # boot chose the executable
    prompts = ["a flower", "a rose"]
    np.testing.assert_array_equal(
        sampler.sample(prompts, seed=3), engine.sample(prompts, seed=3)
    )


def test_precompiled_strict_single_device(engine, tmp_path):
    """On a single-device runtime (the real serving topology) the
    precompiled executable must serve WITHOUT falling back. Subprocess with
    the 8-virtual-device flag stripped."""
    import os
    import subprocess
    import sys

    path = str(tmp_path / "pre_sd.hdmoe")
    # export in the subprocess too: the embedded executable must be
    # compiled under the same 1-device topology it will execute in
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from hdmoe_tpu.deploy import export_sampler, load_sampler\n"
        "from hdmoe_tpu.models import precond_init\n"
        "from hdmoe_tpu.serve import SamplerEngine\n"
        "from tests.test_model import tiny_cfg\n"
        "cfg = tiny_cfg()\n"
        "params = precond_init(jax.random.PRNGKey(0), cfg)\n"
        "engine = SamplerEngine(cfg, params, batch=4, num_steps=2)\n"
        f"export_sampler(engine, {path!r}, precompile=True)\n"
        f"s = load_sampler({path!r})\n"
        "assert s.loaded_precompiled is True\n"
        "imgs = s.sample(['a flower'], seed=3)\n"
        "assert s.loaded_precompiled is True, 'fell back on first call'\n"
        "np.testing.assert_array_equal(imgs, engine.sample(['a flower'], seed=3))\n"
        "print('STRICT_OK')\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORM_NAME"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=repo, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "STRICT_OK" in out.stdout


def test_precompiled_wrong_device_kind_falls_back(engine, tmp_path):
    """A device-kind mismatch must NOT fail the load: the loader falls back
    to the StableHLO program (loaded_precompiled=False) and still works."""
    import pickle
    import zipfile as zf

    path = str(tmp_path / "pre2.hdmoe")
    export_sampler(engine, path, precompile=True)
    backend = jax.default_backend()
    # corrupt the device kind in-place
    with zf.ZipFile(path) as z:
        names = {n: z.read(n) for n in z.namelist()}
    rec = pickle.loads(names[f"exec_{backend}.pkl"])
    rec["device_kind"] = "TPU v9000"
    names[f"exec_{backend}.pkl"] = pickle.dumps(rec)
    with zf.ZipFile(path, "w") as z:
        for n, b in names.items():
            z.writestr(n, b)
    sampler = load_sampler(path)
    assert sampler.loaded_precompiled is False
    assert np.asarray(sampler.sample(["x"], seed=0)).shape[0] == 1
