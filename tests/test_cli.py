"""CLI end-to-end: run the nine commands on a small conf (reference flow)."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(command, conf, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DISMEMBER_FORCE_CPU"] = "1"
    out = subprocess.run(
        [sys.executable, "-m", "dismember_tpu.cli", command, "--conf", conf],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, f"{command} failed:\n{out.stdout}\n{out.stderr}"
    return out


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, small_csv):
    wd = tmp_path_factory.mktemp("cli")
    os.makedirs(wd / "data", exist_ok=True)
    shutil.copy(small_csv, wd / "data" / "example.csv")
    return str(wd)


def _write_conf(path: str, text: str) -> str:
    with open(path, "w") as f:
        f.write(text)
    return path


TDM_CONF = """
init.seq_len             10
init.min_seq_len         2
init.split_for_eval      true
init.split_ratio         0.8
init.data_path           data/example.csv
init.train_path          data/train.csv
init.eval_path           data/eval.csv
init.stat_path           data/stat.txt
init.leaf_id_path        data/leaf.txt
init.tree_protobuf_path  data/tree.bin
init.user_consumed_path  data/consumed.txt

model.deep_model         DIN
model.train_path         data/train.csv
model.eval_path          data/eval.csv
model.tree_protobuf_path data/tree.bin
model.user_consumed_path data/consumed.txt
model.evaluate_during_training false
model.total_batch_size   2048
model.total_eval_batch_size 2048
model.seq_len            10
model.layer_negative_counts 0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200
model.sample_with_probability false
model.start_sample_level 1
model.embed_size         8
model.learning_rate      3e-3
model.iteration_number   30
model.show_progress_interval 30
model.topk_number        10
model.beam_size          20
model.model_path         data/model.bin
model.embed_path         data/embed.csv

cluster.embed_path          data/embed.csv
cluster.tree_protobuf_path  data/tree.bin
cluster.cluster_type        kmeans
cluster.cluster_iter        3
cluster.parallel            false

tree.data_path            data/train.csv
tree.model_path           data/model.bin
tree.tree_protobuf_path   data/tree.bin
tree.deep_model           DIN
tree.gap                  3
tree.seq_len              10
tree.hierarchical_preference false
tree.min_level            0
"""

OTM_CONF = """
model.data_path          data/example.csv
model.model_path         data/otm_model.bin
model.deep_model         DIN
model.train_batch_size   2048
model.eval_batch_size    2048
model.embed_size         8
model.learning_rate      3e-3
model.epoch_num          1
model.topk_number        10
model.beam_size          10
model.show_progress_interval 0
model.seq_len            10
model.min_seq_len        2
model.split_ratio        0.8
model.leaf_init_mode     random
model.initialize_mapping true
model.mapping_path       data/otm_mapping.txt
model.label_num          3
model.target_mode        pseudo
model.seed               42

tree.data_path           data/example.csv
tree.model_path          data/otm_model.bin
tree.mapping_path        data/otm_mapping.txt
tree.deep_model          DIN
tree.gap                 4
tree.label_num           3
tree.seq_len             10
tree.min_seq_len         2
tree.split_ratio         0.8
"""

DR_CONF = """
model.data_path          data/example.csv
model.model_path         data/dr_model.bin
model.mapping_path       data/dr_mapping.bin
model.train_batch_size   2048
model.eval_batch_size    2048
model.num_layer          3
model.num_node           20
model.num_path_per_item  2
model.embed_size         8
model.learning_rate      3e-3
model.epoch_num          1
model.num_sampled        1
model.topk_number        10
model.beam_size          10
model.show_progress_interval 0
model.seq_len            10
model.min_seq_len        2
model.split_ratio        0.8
model.initialize_mapping true

cd.data_path             data/example.csv
cd.model_path            data/dr_model.bin
cd.mapping_path          data/dr_mapping.bin
cd.train_batch_size      2048
cd.eval_batch_size       2048
cd.num_layer             3
cd.num_node              20
cd.num_path_per_item     2
cd.seq_len               10
cd.min_seq_len           2
cd.split_ratio           0.8
cd.initialize_mapping    false
cd.candidate_path_num    10
cd.iteration_num         1
cd.train_mode            streaming
"""


def test_tdm_workflow(workdir):
    conf = _write_conf(os.path.join(workdir, "tdm.conf"), TDM_CONF)
    run_cli("tdm-initialize-tree", conf, workdir)
    for f in ["train.csv", "eval.csv", "stat.txt", "leaf.txt", "tree.bin", "consumed.txt"]:
        assert os.path.exists(os.path.join(workdir, "data", f))
    out = run_cli("tdm-train-deep-model", conf, workdir)
    assert "Recommendation result" in out.stdout + out.stderr
    assert os.path.exists(os.path.join(workdir, "data", "model.bin.npz"))
    assert os.path.exists(os.path.join(workdir, "data", "embed.csv"))
    run_cli("tdm-cluster-tree", conf, workdir)
    run_cli("jtm-tree-learning", conf, workdir)  # re-learns tree.bin in place


def test_otm_workflow(workdir):
    conf = _write_conf(os.path.join(workdir, "otm.conf"), OTM_CONF)
    run_cli("otm-train-deep-model", conf, workdir)
    assert os.path.exists(os.path.join(workdir, "data", "otm_model.bin.npz"))
    assert os.path.exists(os.path.join(workdir, "data", "otm_mapping.txt"))
    run_cli("otm-construct-tree", conf, workdir)
    # mapping still total + bijective after construction
    from dismember_tpu.data.otm_dataset import load_mapping

    fwd, _rev = load_mapping(os.path.join(workdir, "data", "otm_mapping.txt"))
    assert len(set(fwd.values())) == len(fwd)


def test_dr_workflow(workdir):
    conf = _write_conf(os.path.join(workdir, "dr.conf"), DR_CONF)
    run_cli("dr-train-deep-model", conf, workdir)
    assert os.path.exists(os.path.join(workdir, "data", "dr_model.bin.layer.npz"))
    assert os.path.exists(os.path.join(workdir, "data", "dr_mapping.bin"))
    run_cli("dr-coordinate-descent", conf, workdir)
    from dismember_tpu.index.paths import PathIndex

    idx, mapping = PathIndex.read(
        os.path.join(workdir, "data", "dr_mapping.bin"), num_nodes=20
    )
    assert idx.item_paths.shape[1:] == (2, 3)
