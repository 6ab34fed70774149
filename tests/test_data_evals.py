"""Data layer (masks, padding, transforms) + eval metrics tests."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from video_llamagen_tpu.data import transforms as T
from video_llamagen_tpu.data.datasets import (
    build_attn_mask, left_pad_t5, BatchIterator, build_dataset,
    T2VLatentDataset)
from video_llamagen_tpu.evals import metrics as M


# ------------------------------------------------------------- data contracts

def test_left_pad_t5_contract():
    feat = np.ones((1, 7, 16), np.float32)
    padded, mask = left_pad_t5(feat, max_len=10)
    assert padded.shape == (10, 16)
    np.testing.assert_array_equal(mask, [0, 0, 0, 1, 1, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(padded[:3], 0)
    np.testing.assert_array_equal(padded[3:], 1)


def test_left_pad_t5_truncates():
    feat = np.arange(15 * 4, dtype=np.float32).reshape(15, 4)
    padded, mask = left_pad_t5(feat, max_len=10)
    assert mask.sum() == 10
    np.testing.assert_array_equal(padded, feat[:10])


def test_build_attn_mask_matches_reference_semantics():
    """t2v.py:156-161: causal * text-col-valid, then forced diagonal."""
    emb_mask = np.array([0, 0, 1], np.float32)
    m = build_attn_mask(5, emb_mask, text_len=3)[0]
    assert m.dtype == bool
    # row 0 (padded text): only diagonal survives
    np.testing.assert_array_equal(m[0], [True, False, False, False, False])
    # row 3 (first code token): cols 0,1 masked (padded text), 2,3 visible
    np.testing.assert_array_equal(m[3], [False, False, True, True, False])
    # causal upper triangle stays masked
    assert not m[1, 4]


def test_center_crop_resize_video():
    v = np.random.RandomState(0).rand(3, 40, 60, 3).astype(np.float32)
    out = T.center_crop_resize_video(v, 16)
    assert out.shape == (3, 16, 16, 3)


def test_temporal_random_crop():
    crop = T.TemporalRandomCrop(8)
    b, e = crop(100, np.random.RandomState(0))
    assert e - b == 8 and 0 <= b < 100
    idx = T.temporal_sample_indices(b, e, 5)
    assert len(idx) == 5 and idx[0] == b and idx[-1] == e - 1


def test_to_tensor_and_normalize():
    v = (np.random.RandomState(0).rand(2, 4, 4, 3) * 255).astype(np.uint8)
    t = T.normalize_video(T.to_tensor_video(v))
    assert t.min() >= -1.0 and t.max() <= 1.0


def test_latent_dataset_and_iterator(tmp_path):
    lat_dir = tmp_path / "latents"
    t5_dir = tmp_path / "t5"
    os.makedirs(lat_dir / "vids")
    os.makedirs(t5_dir / "vids")
    meta = []
    for i in range(4):
        np.save(lat_dir / "vids" / f"v{i}.npy",
                np.random.rand(12, 4).astype(np.float32))
        np.save(t5_dir / "vids" / f"v{i}.npy",
                np.random.rand(1, 5, 8).astype(np.float32))
        meta.append({"path": f"vids/v{i}.mp4", "cap": ["hello"]})
    meta_file = tmp_path / "meta.json"
    meta_file.write_text(json.dumps(meta))

    ds = build_dataset("t2v_latents", latent_root=str(lat_dir),
                       video_meta_info_file=str(meta_file),
                       t5_path=str(t5_dir), data_repeat=2)
    assert len(ds) == 8
    item = ds[0]
    assert item["latents"].shape == (12, 4)
    assert item["t5_feat"].shape == (120, 8)
    assert item["emb_mask"].sum() == 5

    it = BatchIterator(ds, batch_size=4, shard_id=0, num_shards=2)
    batches = list(it)
    assert len(batches) == 1
    assert batches[0]["latents"].shape == (4, 12, 4)


def test_batch_iterator_sharding_disjoint():
    class Rng:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray(i)}

    a = [b["x"].tolist() for b in BatchIterator(Rng(), 2, shard_id=0,
                                                num_shards=2, shuffle=False)]
    b = [bb["x"].tolist() for bb in BatchIterator(Rng(), 2, shard_id=1,
                                                  num_shards=2, shuffle=False)]
    flat_a = {x for pair in a for x in pair}
    flat_b = {x for pair in b for x in pair}
    assert not (flat_a & flat_b)


def test_prefetch_iterator_matches_and_propagates_errors():
    from video_llamagen_tpu.data.datasets import PrefetchIterator

    class Rng:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"x": np.asarray(i)}

    base = lambda: BatchIterator(Rng(), 3, shuffle=False)
    plain = [b["x"].tolist() for b in base()]
    pre = [b["x"].tolist() for b in PrefetchIterator(base(), depth=2)]
    assert plain == pre
    assert len(PrefetchIterator(base())) == len(base())

    class Boom:
        def __iter__(self):
            yield {"x": np.zeros(1)}
            raise RuntimeError("producer died")

    it = iter(PrefetchIterator(Boom()))
    next(it)
    try:
        next(it)
        assert False, "expected producer error to re-raise"
    except RuntimeError as e:
        assert "producer died" in str(e)


def test_read_video_frames_gif_fallback(tmp_path):
    from PIL import Image
    from video_llamagen_tpu.data.datasets import read_video_frames
    frames = [(np.full((8, 8, 3), 30 * t, np.uint8)) for t in range(4)]
    ims = [Image.fromarray(f) for f in frames]
    path = str(tmp_path / "clip.gif")
    ims[0].save(path, save_all=True, append_images=ims[1:], duration=100)
    out = read_video_frames(path, np.asarray([0, 2]))
    assert out.shape == (2, 8, 8, 3)
    assert out.dtype == np.uint8


# ------------------------------------------------------------------- metrics

def test_psnr_identical_and_noisy():
    a = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    p_same = np.asarray(M.psnr(jnp.asarray(a), jnp.asarray(a)))
    assert (p_same > 80).all()
    noisy = np.clip(a + 0.1 * np.random.RandomState(1).randn(*a.shape), 0, 1)
    p_noisy = np.asarray(M.psnr(jnp.asarray(a), jnp.asarray(noisy.astype(np.float32))))
    assert (p_noisy < 30).all() and (p_noisy > 10).all()


def test_ssim_bounds():
    a = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    s_same = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-4)
    b = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    s_diff = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert (s_diff < 0.5).all()


def test_fid_zero_for_same_distribution():
    rs = np.random.RandomState(0)
    feats = rs.randn(500, 8).astype(np.float64)
    mu, sigma = M.activation_statistics(feats)
    assert M.frechet_distance(mu, sigma, mu, sigma) < 1e-6
    # shifted distribution -> positive FID
    feats2 = feats + 3.0
    mu2, sigma2 = M.activation_statistics(feats2)
    fid = M.frechet_distance(mu, sigma, mu2, sigma2)
    np.testing.assert_allclose(fid, 9 * 8, rtol=0.05)  # ||3||^2 per dim


def test_inception_score_uniform_is_one():
    probs = np.full((100, 10), 0.1)
    np.testing.assert_allclose(M.inception_score(probs), 1.0, atol=1e-5)


def test_precision_recall_identical():
    rs = np.random.RandomState(0)
    feats = rs.randn(64, 4)
    p, r = M.manifold_precision_recall(feats, feats)
    assert p == 1.0 and r == 1.0


def test_video_psnr_ssim_shapes():
    a = np.random.RandomState(0).rand(2, 3, 32, 32, 3).astype(np.float32)
    p, s = M.video_psnr_ssim(jnp.asarray(a), jnp.asarray(a))
    assert p.shape == (2,) and s.shape == (2,)


def test_npz_format(tmp_path):
    samples = (np.random.RandomState(0).rand(4, 8, 8, 3) * 255).astype(np.uint8)
    path = M.create_npz_from_samples(samples, str(tmp_path / "s.npz"))
    loaded = np.load(path)
    np.testing.assert_array_equal(loaded["arr_0"], samples)


def test_fvd_math():
    from video_llamagen_tpu.evals.fvd import fvd_from_features, preprocess_videos
    rs = np.random.RandomState(0)
    real = rs.randn(200, 16)
    assert fvd_from_features(real, real + 0.0) < 1e-6
    fake = real + 2.0
    np.testing.assert_allclose(fvd_from_features(real, fake), 4 * 16, rtol=0.05)
    v = rs.rand(1, 3, 32, 32, 3)
    out = preprocess_videos(v, target=8)
    assert out.shape == (1, 3, 8, 8, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_extract_codes_batch():
    import jax
    from video_llamagen_tpu.core.config import VQConfig
    from video_llamagen_tpu.tokenizers.vq import model as vq
    from video_llamagen_tpu.train.extract_codes import extract_batch
    cfg = VQConfig(ch=8, z_channels=8, codebook_size=16, codebook_embed_dim=4,
                   encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                   num_res_blocks=1, dtype="float32")
    params = vq.init_vq_params(jax.random.key(0), cfg)
    imgs = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    codes = extract_batch(params, cfg, imgs)
    assert codes.shape == (2, 2, 64)  # (B, n_aug, 8*8)
    assert codes.dtype == np.int32 or codes.dtype == np.int64


def test_load_video_set(tmp_path):
    from video_llamagen_tpu.evals.eval_common_metric import load_video_set
    for i in range(2):
        np.save(tmp_path / f"c{i}.npy",
                (np.random.RandomState(i).rand(3, 8, 8, 3) * 255)
                .astype(np.float32))
    vids = load_video_set(str(tmp_path))
    assert vids.shape == (2, 3, 8, 8, 3)
    assert vids.max() <= 1.0


def test_hub_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from video_llamagen_tpu.models import hub
    from video_llamagen_tpu.core.config import GPTConfig
    params = {"a": jnp.ones((2, 3)), "layers": {"w": jnp.zeros((4,))},
              "lst": [{"x": jnp.full((2,), 7.0)}, {"x": jnp.full((2,), 8.0)}]}
    cfg = GPTConfig(dim=64, n_layer=2, n_head=4)
    hub.save_pretrained(str(tmp_path / "m"), params, cfg)
    p2, c2 = hub.from_pretrained(str(tmp_path / "m"), GPTConfig)
    assert c2.dim == 64 and c2.n_layer == 2
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(p2["lst"][1]["x"]), 8.0)


def test_clip_score_from_features():
    from video_llamagen_tpu.evals.clip_score import clip_score_from_features
    rs = np.random.RandomState(0)
    a = rs.randn(10, 8)
    # identical embeddings -> score 100
    np.testing.assert_allclose(clip_score_from_features(a, a), 100.0, atol=1e-5)
    # orthogonal -> 0
    b = np.roll(a, 1, axis=0)
    s = clip_score_from_features(a, -a)
    assert s == 0.0


def test_cost_estimators():
    from video_llamagen_tpu.core.config import gpt_config, CausalVAEConfig
    from video_llamagen_tpu.evals.cost import gpt_cost, causal_vae_cost
    r = gpt_cost(gpt_config("GPT-B", vocab_size=16384, block_size=256,
                            cls_token_num=1), batch=8)
    d = r.as_dict()
    assert 100 < d["params_M"] < 125          # ~111M
    assert d["gflops_per_token"] > 0.2        # ~2*111M = 0.22 GF
    assert d["kv_cache_MB"] > 0
    v = causal_vae_cost(CausalVAEConfig(), 17, 256, 256).as_dict()
    assert v["tflops_forward"] > 0.1


def test_video_grid_and_save(tmp_path):
    from video_llamagen_tpu.data.video_io import make_video_grid, save_video_grid
    vids = np.random.RandomState(0).rand(3, 2, 8, 8, 3).astype(np.float32)
    grid = make_video_grid(vids, nrow=2)
    assert grid.shape[0] == 2 and grid.ndim == 4
    out = save_video_grid(vids, str(tmp_path / "g.mp4"))
    assert out is not None and os.path.exists(out)


def test_inception_helpers_and_bn_fold():
    import jax
    import torch
    from video_llamagen_tpu.evals import inception as inc
    # avg pool excludes padding: corner of a ones image stays 1.0
    x = jnp.ones((1, 5, 5, 2))
    p = np.asarray(inc._avg_pool_nopad(x))
    np.testing.assert_allclose(p, 1.0, atol=1e-6)
    # BN folding: conv(x)*scale+bias == batchnorm(conv(x))
    sd = {
        "c.conv.weight": torch.randn(4, 3, 1, 1),
        "c.bn.weight": torch.rand(4) + 0.5,
        "c.bn.bias": torch.randn(4),
        "c.bn.running_mean": torch.randn(4),
        "c.bn.running_var": torch.rand(4) + 0.5,
    }
    def conv_bn_import(prefix):
        # reuse the internal folding from the importer
        full = {f"{prefix}.conv.weight": sd["c.conv.weight"],
                f"{prefix}.bn.weight": sd["c.bn.weight"],
                f"{prefix}.bn.bias": sd["c.bn.bias"],
                f"{prefix}.bn.running_mean": sd["c.bn.running_mean"],
                f"{prefix}.bn.running_var": sd["c.bn.running_var"],
                "fc.weight": torch.zeros(2, 2), "fc.bias": torch.zeros(2)}
        return full
    import torch.nn.functional as F
    x_t = torch.randn(1, 3, 4, 4)
    y_conv = F.conv2d(x_t, sd["c.conv.weight"])
    y_bn = F.batch_norm(y_conv, sd["c.bn.running_mean"], sd["c.bn.running_var"],
                        sd["c.bn.weight"], sd["c.bn.bias"], eps=1e-3)
    want = torch.relu(y_bn).numpy()
    # our folded path
    w = sd["c.conv.weight"].numpy().transpose(2, 3, 1, 0)
    gamma, beta = sd["c.bn.weight"].numpy(), sd["c.bn.bias"].numpy()
    mean, var = sd["c.bn.running_mean"].numpy(), sd["c.bn.running_var"].numpy()
    scale = gamma / np.sqrt(var + 1e-3)
    bias = beta - mean * scale
    got = np.asarray(inc._conv_bn(
        {"kernel": jnp.asarray(w), "scale": jnp.asarray(scale),
         "bias": jnp.asarray(bias)},
        jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)), padding="VALID"))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_metrics_writer(tmp_path):
    import json
    from video_llamagen_tpu.core.logging import MetricsWriter
    w = MetricsWriter(str(tmp_path))
    w.write(1, loss=2.5, note="ok")
    w.write(2, loss=2.25)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 2.5 and lines[1]["step"] == 2


def test_caption_cleaning():
    from video_llamagen_tpu.text.t5 import clean_caption, text_preprocessing
    out = clean_caption("Check THIS out!! http://spam.example/x @user #1 <b>bold</b>")
    assert "http" not in out and "@user" not in out and "<b>" not in out
    assert out == out.lower()
    assert "!!" not in out  # duplicate punctuation collapsed
    # two-pass entry point
    assert text_preprocessing("  HELLO   World  ") == "hello world"


def test_checkpoint_trainstate_roundtrip(tmp_path):
    import jax
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    from video_llamagen_tpu.core.config import GPTConfig, TrainConfig
    from video_llamagen_tpu.train.train_state import create_train_state
    cfg = GPTConfig(dim=32, n_layer=2, n_head=2, vocab_size=64, num_classes=4,
                    block_size=16, cls_token_num=1, model_type="c2i",
                    dtype="float32")
    tcfg = TrainConfig(ema=True)
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    state = state._replace(step=state.step + 7)
    cm = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                           async_save=False)
    cm.save(7, state._asdict())
    cm.wait()
    fresh = create_train_state(jax.random.key(1), cfg, tcfg)
    restored = cm.restore(fresh._asdict())
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["tok_embeddings"]),
        np.asarray(state.params["tok_embeddings"]))
    np.testing.assert_array_equal(
        np.asarray(restored["ema_params"]["norm"]),
        np.asarray(state.ema_params["norm"]))
    cm.close()


def test_inception_forward_wiring():
    """Random-init InceptionV3: full forward produces the right taps."""
    import jax
    from video_llamagen_tpu.evals.inception import (
        init_inception_params, inception_forward)
    p = init_inception_params(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 299, 299, 3)
                    .astype(np.float32))
    pool3, spatial, probs = inception_forward(p, x)
    assert pool3.shape == (1, 2048)
    assert spatial.shape[0] == 1 and spatial.shape[-1] == 768
    assert probs.shape == (1, 1008)
    np.testing.assert_allclose(float(probs.sum()), 1.0, rtol=1e-4)
    assert np.isfinite(np.asarray(pool3)).all()


# ---------------------------------------------------------------------------
# Transform zoo completion (ref dataset/transform.py:38-148, 199-538)
# ---------------------------------------------------------------------------

def _clip(h=20, w=30, t=3):
    return np.arange(t * h * w * 3, dtype=np.float32).reshape(t, h, w, 3)


def test_crop_and_center_crop_video():
    v = _clip()
    c = T.crop_video(v, 2, 3, 10, 12)
    assert c.shape == (3, 10, 12, 3)
    np.testing.assert_array_equal(c, v[:, 2:12, 3:15])
    cc = T.center_crop_video(v, 10, 12)
    np.testing.assert_array_equal(cc, v[:, 5:15, 9:21])
    with np.testing.assert_raises(ValueError):
        T.center_crop_video(v, 21, 5)


def test_center_crop_short_edge_and_th_tw():
    v = _clip(20, 30)
    sq = T.center_crop_short_edge(v)
    assert sq.shape == (3, 20, 20, 3)
    # aspect crop: th/tw = 1/2 on a 20x30 input -> 15x30 crop
    c = T.center_crop_th_tw(v, 10, 20)
    assert c.shape == (3, 15, 30, 3)
    top = T.center_crop_th_tw(v, 10, 20, top_crop=True)
    np.testing.assert_array_equal(top, v[:, :15])


def test_random_crops_deterministic():
    rng = np.random.RandomState(0)
    v = _clip()
    rc = T.random_crop_video(rng, v, 10, 10)
    assert rc.shape == (3, 10, 10, 3)
    rs = T.random_shift_crop(np.random.RandomState(1), v)
    assert rs.shape == (3, 20, 20, 3)
    # exact-size random crop is the identity
    np.testing.assert_array_equal(
        T.random_crop_video(rng, v, 20, 30), v)


def test_resize_scale_and_ucf_kinetics():
    v = _clip(20, 30)
    r = T.resize_scale_video(v, 40)            # short side 20 -> 40
    assert r.shape == (3, 40, 60, 3)
    u = T.ucf_center_crop_video(v, 16)
    assert u.shape == (3, 16, 16, 3)
    k = T.kinetics_random_crop_resize_video(np.random.RandomState(2), v, 16)
    assert k.shape == (3, 16, 16, 3)
    rc = T.resized_crop_video(v, 0, 0, 10, 10, (8, 8))
    assert rc.shape == (3, 8, 8, 3)
    ctw = T.center_crop_resize_th_tw(v, 16, 16)
    assert ctw.shape == (3, 16, 16, 3)


def test_dynamic_sample_duration():
    d = T.DynamicSampleDuration(t_stride=2, extra_1=True)
    for seed in range(5):
        s, e = d(17, 32, 32, np.random.RandomState(seed))
        assert s == 0 and e >= 17 // 2 and e <= 17 and (e - 1) % 2 == 0
    d2 = T.DynamicSampleDuration(t_stride=1, extra_1=False)
    s, e = d2(16, 8, 8, np.random.RandomState(0))
    assert 8 <= e <= 16


def test_checkpoint_missing_step_clear_error(tmp_path):
    """A missing/nonexistent step must raise FileNotFoundError, not orbax's
    misleading 'Must provide args of type Composite' ValueError (bit the
    round-3 chip chain: sampling a checkpoint whose training never ran)."""
    import pytest as _pytest
    from video_llamagen_tpu.core.checkpoint import CheckpointManager
    d = tmp_path / "ck"
    d.mkdir()
    cm = CheckpointManager(str(d), async_save=False)
    with _pytest.raises(FileNotFoundError):
        cm.restore({"a": jnp.zeros(2)}, step=None)     # empty dir
    cm2 = CheckpointManager(str(d), async_save=False)
    cm2.save(3, {"a": jnp.ones(2)})
    cm2.wait()
    with _pytest.raises(FileNotFoundError, match="step 1000"):
        cm2.restore({"a": jnp.zeros(2)}, step=1000)    # absent step
    out = cm2.restore({"a": jnp.zeros(2)}, step=3)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
    cm.close(); cm2.close()


def test_load_params_subtree_matches_full_restore(tmp_path):
    """Params-only fast restore (VERDICT r3 #7) returns the same params as
    the full StandardRestore, prefers EMA when asked, falls back when the
    run had no EMA, and casts on host when dtype is given."""
    import jax
    from video_llamagen_tpu.core.checkpoint import (CheckpointManager,
                                                    load_gpt_orbax)
    from video_llamagen_tpu.core.config import GPTConfig, TrainConfig
    from video_llamagen_tpu.train.train_state import create_train_state
    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, vocab_size=64, block_size=16,
                    num_classes=4, cls_token_num=1, model_type="c2i",
                    dtype="float32")
    st = create_train_state(jax.random.key(1), cfg, TrainConfig(ema=True))
    st = st._replace(ema_params=jax.tree_util.tree_map(
        lambda x: x + 1.0, st.params))          # make EMA distinguishable
    d = tmp_path / "ck"
    cm = CheckpointManager(str(d), async_save=False)
    cm.save(7, st._asdict())
    cm.wait(); cm.close()

    got = load_gpt_orbax(str(d), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got_ema = load_gpt_orbax(str(d), cfg, ema=True)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got_ema)[0]),
        np.asarray(jax.tree_util.tree_leaves(st.ema_params)[0]))
    got_bf16 = load_gpt_orbax(str(d), cfg, dtype="bfloat16")
    assert jax.tree_util.tree_leaves(got_bf16)[0].dtype == jnp.bfloat16

    # no-EMA checkpoint: ema=True falls back to params
    st2 = create_train_state(jax.random.key(2), cfg, TrainConfig(ema=False))
    d2 = tmp_path / "ck2"
    cm2 = CheckpointManager(str(d2), async_save=False)
    cm2.save(1, st2._asdict())
    cm2.wait(); cm2.close()
    got2 = load_gpt_orbax(str(d2), cfg, ema=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(got2)[0]),
        np.asarray(jax.tree_util.tree_leaves(st2.params)[0]))
