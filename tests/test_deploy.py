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
