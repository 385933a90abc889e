import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_compression_project_tpu.models import (
    ByteTokenizer,
    EmbedderConfig,
    HashNGramEmbedder,
    NeuralEmbedder,
    VLMRunner,
    get_preset,
)


def test_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "Hello, TPU! émojis: ✓"
    assert tok.decode(tok.encode(s)) == s
    ids, lens = tok.encode_batch(["ab", "cdef"], max_len=8)
    assert ids.shape == (2, 8)
    assert lens.tolist() == [2, 4]
    assert tok.decode(ids[1][: lens[1]]) == "cdef"


@pytest.fixture(scope="module")
def tiny_runner():
    return VLMRunner(get_preset("tiny"), seed=0, max_new_default=16)


@pytest.mark.slow
def test_vlm_forward_shapes(tiny_runner):
    cfg = tiny_runner.cfg
    grid = cfg.vision.grid
    patch_dim = cfg.vision.patch ** 2 * 3
    pages = jnp.zeros((2, grid * grid, patch_dim), jnp.bfloat16)
    ids = jnp.zeros((2, 12), jnp.int32)
    logits = tiny_runner.model.apply(
        {"params": tiny_runner.params}, pages, ids
    )
    t_vis = cfg.vision.tokens_out
    assert logits.shape == (2, t_vis + 12, cfg.decoder.vocab)


def test_vlm_extract_batch_valid_pages(tiny_runner):
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 256, size=(2, 100, 80, 3), dtype=np.uint8)
    out = tiny_runner.extract_batch(pages, page_numbers=[1, 2], max_new=12)
    assert len(out) == 2
    for i, page in enumerate(out):
        assert set(page) == {"page_number", "markdown", "entities", "summary"}
        assert page["page_number"] == i + 1
        assert isinstance(page["markdown"], str)
        assert isinstance(page["entities"], list)


def test_vlm_generation_deterministic(tiny_runner):
    rng = np.random.default_rng(1)
    pages = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    a = tiny_runner.extract_batch(pages, page_numbers=[1], max_new=12)
    b = tiny_runner.extract_batch(pages, page_numbers=[1], max_new=12)
    assert a == b


def test_vlm_answer_runs(tiny_runner):
    ans = tiny_runner.answer("What is X?", "[Page 1] X is Y.", max_new=8)
    assert isinstance(ans, str)


def test_vlm_answer_oversized_evidence_stays_in_context(tiny_runner):
    # top_k 8 x 1500-char pages once overflowed the decoder context when the
    # blank-vision prefix was added; answer() must truncate, not crash.
    evidence = "\n\n---\n\n".join(
        f"[Page {i} | memory_id=m{i:02d}]\n" + ("evidence words " * 120)
        for i in range(1, 9)
    )
    ans = tiny_runner.answer("What about evidence?", evidence, max_new=8)
    assert isinstance(ans, str)
    # and the blank-vision prefix is cached after first use
    assert tiny_runner._blank_vision() is tiny_runner._blank_vision()


def test_hash_embedder_semantic_ordering():
    emb = HashNGramEmbedder(EmbedderConfig(dim=256, ngram_buckets=2048))
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "deep learning on tensor processing units",
        "stock market prices rose sharply today",
    ]
    vecs = emb.embed(docs)
    assert vecs.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-3)
    q = emb.embed(["tensor processing unit learning"])[0]
    sims = vecs @ q
    assert np.argmax(sims) == 1


def test_hash_embedder_deterministic():
    a = HashNGramEmbedder(EmbedderConfig(dim=128, ngram_buckets=512)).embed(["same text"])
    b = HashNGramEmbedder(EmbedderConfig(dim=128, ngram_buckets=512)).embed(["same text"])
    np.testing.assert_array_equal(a, b)


def test_neural_embedder_shapes_and_mask():
    emb = NeuralEmbedder(EmbedderConfig(dim=64, depth=1, heads=2, max_seq=128))
    vecs = emb.embed(["short", "a much longer text that has more bytes"])
    assert vecs.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-3)
    # Padding must not affect the embedding: same text alone vs batched with
    # a longer one (different pad amounts).
    solo = emb.embed(["short"])
    np.testing.assert_allclose(vecs[0], solo[0], atol=2e-2)


def test_moe_preset_forward():
    runner = VLMRunner(get_preset("tiny_moe"), seed=0)
    cfg = runner.cfg
    grid = cfg.vision.grid
    pages = jnp.zeros((1, grid * grid, cfg.vision.patch ** 2 * 3), jnp.bfloat16)
    ids = jnp.zeros((1, 8), jnp.int32)
    logits = runner.model.apply({"params": runner.params}, pages, ids)
    assert logits.shape[-1] == cfg.decoder.vocab


@pytest.mark.slow
def test_vlm_runner_mesh_dp_tp(mesh8):
    """Mesh-aware serving: params TP/EP-sharded, page batch over data axis."""
    import numpy as np

    from vision_compression_project_tpu.models import VLMRunner, get_preset

    runner = VLMRunner(get_preset("tiny"), seed=0, mesh=mesh8)
    # A TP-annotated kernel is physically sharded over the model axis.
    spec = str(runner.params["decoder"]["block_0"]["mlp"]["gate"]["kernel"].sharding.spec)
    assert "model" in spec
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    with mesh8:
        out = runner.extract_batch(pages, page_numbers=[1, 2], max_new=8)
    assert len(out) == 2
    assert set(out[0]) == {"page_number", "markdown", "entities", "summary"}
    # Same weights => same outputs as the unsharded runner.
    solo = VLMRunner(get_preset("tiny"), seed=0)
    assert solo.extract_batch(pages, page_numbers=[1, 2], max_new=8) == out


def test_logit_mask_constrains_emission(tiny_runner):
    """Token-level constrained decoding: emitted bytes stay inside the
    output grammar (printable/UTF-8 + separators), never specials/control."""
    import numpy as np

    from vision_compression_project_tpu.models.tokenizer import (
        EOS_ID,
        SEP_ID,
    )
    from vision_compression_project_tpu.models.vlm import UNIT_SEP

    rng = np.random.default_rng(3)
    pages = rng.integers(0, 256, size=(2, 80, 80, 3), dtype=np.uint8)
    vis = tiny_runner._encode(
        tiny_runner.params, tiny_runner.preprocess_patches(pages)
    )
    from vision_compression_project_tpu.models.tokenizer import (
        BOS_ID,
        TASK_EXTRACT_ID,
    )

    seqs = tiny_runner._run_generate(
        [[BOS_ID, TASK_EXTRACT_ID]] * 2, vis, 32, task="extract"
    )
    allowed = set(range(0x20, 0x7F)) | set(range(0x80, 0x100)) | {
        0x09, 0x0A, SEP_ID, UNIT_SEP,
    }
    for seq in seqs:
        assert seq, "should emit at least one token"
        assert all(t in allowed for t in seq), seq
