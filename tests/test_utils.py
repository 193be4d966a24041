"""Saver format, checkpoint save/load/resume, loss buckets, plots, stats."""

import json
import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu.utils import (
    MetricsBus, RuntimeStats, Saver, bi_loss_plot, load_checkpoint,
    load_params_lenient, loss_bucket_filename, save_checkpoint,
    score_plotting, tri_loss_plot)


def test_saver_log_format(tmp_path):
    s = Saver(str(tmp_path))
    s.add_summary_msg(" > params amount: 1,234")
    s.global_step_increment()
    s.add_summary("batch loss", 0.5)
    s.add_summary("note", "hello", step=7)
    log = (tmp_path / "log.txt").read_text().splitlines()
    assert log[0] == " > params amount: 1,234"
    assert log[1].startswith("batch loss | 0.5000000000 |          1 | ")
    assert "hello" in log[2] and "         7" in log[2]


def test_loss_bucket_names():
    # agent_pretrain.py:594-632 bands
    assert loss_bucket_filename(0.73) == "trainloss_70"
    assert loss_bucket_filename(0.41) == "trainloss_40"
    assert loss_bucket_filename(0.39) == "trainloss_39"
    assert loss_bucket_filename(0.13) == "trainloss_13"
    assert loss_bucket_filename(0.05) is None
    assert loss_bucket_filename(1.2) == "trainloss_120_high"


def test_checkpoint_roundtrip_and_resume(tmp_path):
    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    opt_state = {"m": jnp.zeros((4,))}
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, params, opt_state, step=17, extra={"epoch": 3})
    out = load_checkpoint(path)
    assert out["step"] == 17 and out["extra"]["epoch"] == 3
    np.testing.assert_array_equal(out["params"]["a"], np.arange(4.0))
    np.testing.assert_array_equal(out["opt_state"]["m"], np.zeros(4))


def test_lenient_load_strict_false(tmp_path):
    src = {"emb": {"x": jnp.ones((3, 3))}, "extra": jnp.zeros((2,))}
    path = str(tmp_path / "src.ckpt")
    save_checkpoint(path, src)
    tmpl = {"emb": {"x": jnp.zeros((3, 3))}, "new_head": jnp.full((4,), 7.0)}
    merged = load_params_lenient(path, tmpl)
    np.testing.assert_array_equal(np.asarray(merged["emb"]["x"]), np.ones((3, 3)))
    np.testing.assert_array_equal(np.asarray(merged["new_head"]), np.full(4, 7.0))


def test_metrics_bus_history(tmp_path):
    s = Saver(str(tmp_path))
    bus = MetricsBus(s)
    bus.log({"loss": 1.0})
    bus.log({"loss": 0.5})
    assert bus.history["loss"] == [1.0, 0.5]
    assert "loss" in (tmp_path / "log.txt").read_text()


def test_plots_write_files(tmp_path):
    bi_loss_plot([1, 2], [2, 1], [3, 3], ["a", "b", "c"],
                 str(tmp_path / "bi.png"))
    tri_loss_plot([1], [2], [3], [4], ["a", "b", "c", "d"],
                  str(tmp_path / "tri.png"))
    score_plotting([0.1, 0.2], [0.8, 0.9], str(tmp_path / "score.png"))
    for f in ("bi.png", "tri.png", "score.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_runtime_stats_contract(tmp_path):
    st = RuntimeStats()
    st.add_song(2.0, 100)
    st.add_song(2.0, 140)
    out = st.dump(str(tmp_path / "runtime_stats.json"))
    data = json.loads((tmp_path / "runtime_stats.json").read_text())
    # reference key names (testing-no-type-cp.py:216-224)
    assert set(data) == {"song_time", "words_len_list", "ave token time:",
                         "ave song time"}
    assert data["ave token time:"] == 60.0
    assert data["ave song time"] == 2.0


@pytest.mark.slow  # writes a real jax.profiler trace (~8s of IO)
def test_profile_trace_writes_trace(tmp_path):
    from reinforcement_learning_in_music_generation_tpu.utils import profile_trace
    import jax.numpy as jnp
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "no trace files written"
    # no-op path
    with profile_trace(None):
        pass


def test_summarize_trace(tmp_path):
    """Capture a trace and get a device-op-kind breakdown back."""
    import jax
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu.utils import (
        profile_trace, summarize_trace)

    a = jnp.ones((256, 256))
    f = jax.jit(lambda a: (a @ a).sum())
    float(f(a))
    with profile_trace(str(tmp_path / "t")):
        float(f(a))
    rows = summarize_trace(str(tmp_path / "t"), top=10)
    assert rows and all(len(r) == 3 for r in rows)
    # on the CPU test platform there may be no device pids; the call at
    # least parses and returns a (possibly empty on CPU) list — on TPU it
    # returns the per-kind device-time table used in BENCH.md


def test_prefetch_batches_matches_inline_slicing():
    """train/data_pipeline.py: same order/content as inline slicing, at
    any depth, with and without a dp mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reinforcement_learning_in_music_generation_tpu.parallel import (
        make_mesh)
    from reinforcement_learning_in_music_generation_tpu.train.data_pipeline \
        import prefetch_batches

    rng = np.random.default_rng(0)
    x = rng.integers(0, 9, (10, 8, 6)).astype(np.int32)
    y = rng.integers(0, 9, (10, 8, 6)).astype(np.int32)
    m = np.ones((10, 8), np.float32)
    for depth in (1, 2, 5, 8):
        seen = list(prefetch_batches(x, y, m, 2, depth=depth))
        assert [i for i, _ in seen] == list(range(5))
        for i, (bx, by, bm) in seen:
            np.testing.assert_array_equal(np.asarray(bx), x[2 * i:2 * i + 2])
            np.testing.assert_array_equal(np.asarray(by), y[2 * i:2 * i + 2])
    mesh = make_mesh(dp=2, tp=1)
    for i, (bx, by, bm) in prefetch_batches(x, y, m, 2, mesh=mesh, depth=3):
        np.testing.assert_array_equal(np.asarray(bx), x[2 * i:2 * i + 2])
        assert "dp" in str(bx.sharding.spec) or bx.sharding.is_fully_replicated
