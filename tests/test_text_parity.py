"""T5/CLIP wrapper parity vs torch with tiny random weights (VERDICT r1 #8).

The encoders are HF wrappers (same approach as reference language/t5.py and
evaluations/t2i/evaluation.py), but the from_pt weight conversion + forward
were previously untested. Tiny random models exercise the exact load path
(save torch -> from_pretrained(from_pt=True)) and pin outputs to torch.
No tokenizer assets exist offline, so tests feed raw input ids.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def t5_dir(tmp_path_factory):
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, decoder_start_token_id=0)
    torch.manual_seed(0)
    model = T5EncoderModel(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_t5")
    model.save_pretrained(d)
    return str(d), model


def test_t5_embedder_matches_torch(t5_dir):
    from video_llamagen_tpu.text.t5 import T5Embedder
    d, tmodel = t5_dir
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, (3, 12)).astype(np.int32)
    attn = np.ones_like(ids)
    attn[1, 8:] = 0  # padded row
    attn[2, 4:] = 0

    emb = T5Embedder(d, dtype="float32")
    ours = emb.embed_token_ids(ids, attn)

    with torch.no_grad():
        ref = tmodel(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(attn).long())
    ref = ref.last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_t5_mask_blocks_pad_content(t5_dir):
    """Valid-position outputs must not depend on what sits in padded slots."""
    from video_llamagen_tpu.text.t5 import T5Embedder
    d, _ = t5_dir
    emb = T5Embedder(d, dtype="float32")
    ids = np.full((1, 10), 5, np.int32)
    attn = np.concatenate([np.ones((1, 6), np.int32),
                           np.zeros((1, 4), np.int32)], axis=1)
    out_a = emb.embed_token_ids(ids, attn)
    ids_b = ids.copy()
    ids_b[0, 6:] = 77  # different garbage in padded slots
    out_b = emb.embed_token_ids(ids_b, attn)
    np.testing.assert_allclose(out_a[0, :6], out_b[0, :6], atol=1e-5)


def test_t5_bf16_dtype_finite(t5_dir):
    from video_llamagen_tpu.text.t5 import T5Embedder
    d, _ = t5_dir
    emb = T5Embedder(d, dtype="bfloat16")
    ids = np.ones((2, 8), np.int32)
    attn = np.ones_like(ids)
    out = emb.embed_token_ids(ids, attn)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, projection_dim=16).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            projection_dim=16).to_dict(),
        projection_dim=16)
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_clip")
    model.save_pretrained(d)
    return str(d), model


def test_clip_flax_matches_torch(clip_dir):
    from transformers import FlaxCLIPModel
    d, tmodel = clip_dir
    fmodel = FlaxCLIPModel.from_pretrained(d, from_pt=True)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 99, (2, 12)).astype(np.int32)
    attn = np.ones_like(ids)
    pix = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    fout = fmodel(input_ids=ids, attention_mask=attn, pixel_values=pix)
    with torch.no_grad():
        tout = tmodel(input_ids=torch.from_numpy(ids).long(),
                      attention_mask=torch.from_numpy(attn).long(),
                      pixel_values=torch.from_numpy(pix))
    np.testing.assert_allclose(np.asarray(fout.image_embeds),
                               tout.image_embeds.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fout.text_embeds),
                               tout.text_embeds.numpy(), atol=2e-4, rtol=1e-3)

    # end to end: the score computed from both stacks agrees
    from video_llamagen_tpu.evals.clip_score import clip_score_from_features
    ours = clip_score_from_features(np.asarray(fout.image_embeds),
                                    np.asarray(fout.text_embeds))
    ref = clip_score_from_features(tout.image_embeds.numpy(),
                                   tout.text_embeds.numpy())
    assert abs(ours - ref) < 1e-2


def test_dump_features_sharded(tmp_path):
    """Sharded offline extraction: each shard writes its contiguous chunk,
    shards cover the set disjointly, already-written files are skipped
    (ref language/extract_t5_feature.py rank split)."""
    from video_llamagen_tpu.text.t5 import dump_features

    class FakeEmbedder:
        calls = 0

        def get_text_embeddings(self, texts):
            FakeEmbedder.calls += 1
            n = len(texts)
            embs = np.arange(n * 4 * 2, dtype=np.float32).reshape(n, 4, 2)
            masks = np.tile(np.array([1, 1, 1, 0]), (n, 1))
            return embs, masks

    caps = [f"cap {i}" for i in range(7)]
    paths = [str(tmp_path / f"{i}.npy") for i in range(7)]
    dump_features(FakeEmbedder(), caps, paths, shard_id=0, num_shards=3)
    dump_features(FakeEmbedder(), caps, paths, shard_id=2, num_shards=3)
    assert sorted(p.name for p in tmp_path.iterdir()) == \
        ["0.npy", "1.npy", "2.npy", "6.npy"]
    dump_features(FakeEmbedder(), caps, paths, shard_id=1, num_shards=3)
    assert len(list(tmp_path.iterdir())) == 7
    a = np.load(paths[0])
    assert a.shape == (1, 3, 2)          # trimmed to mask length

    # resume: nothing left to do -> no embedder calls
    before = FakeEmbedder.calls
    dump_features(FakeEmbedder(), caps, paths, shard_id=1, num_shards=3)
    assert FakeEmbedder.calls == before

    # batched chunking covers everything too
    for p in tmp_path.iterdir():
        p.unlink()
    dump_features(FakeEmbedder(), caps, paths, batch_size=2)
    assert len(list(tmp_path.iterdir())) == 7
