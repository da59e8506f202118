"""Config loading: flat-conf parsing + all param dataclasses against the
reference's shipped conf files (read-only mount)."""

import os

import pytest

from dismember_tpu.core import config as cfg

REF_CONFIGS = "/root/reference/configs"
OUR_CONFIGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)


def _maybe(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} not available")
    return path


def test_read_conf_basic(tmp_path):
    p = tmp_path / "x.conf"
    p.write_text(
        "# comment\n\nmodel.alpha   1\nmodel.beta  two words \ninit.gamma 3\n"
    )
    out = cfg.read_conf(str(p), "model")
    assert out == {"alpha": "1", "beta": "two words"}
    assert cfg.read_conf(str(p), "init") == {"gamma": "3"}


def test_missing_required_key(tmp_path):
    p = tmp_path / "x.conf"
    p.write_text("model.seq_len 10\n")
    with pytest.raises(KeyError):
        cfg.TDMModelParams.from_conf(cfg.read_conf(str(p), "model"))


@pytest.mark.parametrize(
    "fname,loaders",
    [
        (
            "tdm.conf",
            [
                ("init", cfg.TreeInitParams),
                ("model", cfg.TDMModelParams),
                ("cluster", cfg.ClusterParams),
            ],
        ),
        (
            "jtm.conf",
            [
                ("init", cfg.TreeInitParams),
                ("model", cfg.TDMModelParams),
                ("tree", cfg.JTMTreeParams),
            ],
        ),
        ("otm.conf", [("model", cfg.OTMModelParams), ("tree", cfg.OTMTreeParams)]),
        (
            "deep-retrieval.conf",
            [("model", cfg.DRModelParams), ("cd", cfg.DRCoordinateParams)],
        ),
    ],
)
@pytest.mark.parametrize("base", [REF_CONFIGS, OUR_CONFIGS])
def test_all_conf_files_parse(fname, loaders, base):
    """Both the reference's conf files (drop-in compatibility) and ours."""
    path = _maybe(os.path.join(base, fname))
    for prefix, cls in loaders:
        params = cls.from_conf(cfg.read_conf(path, prefix), base_dir="/tmp")
        assert params is not None


def test_tdm_values_from_reference_conf():
    path = _maybe(os.path.join(REF_CONFIGS, "tdm.conf"))
    p = cfg.TDMModelParams.from_conf(cfg.read_conf(path, "model"), base_dir="/x")
    assert p.deep_model == "din"
    assert p.total_batch_size == 8192
    assert p.learning_rate == pytest.approx(1e-4)
    assert p.start_sample_level == 1
    assert not p.sample_with_probability
    assert p.model_path == "/x/data/tdm_model.bin"
