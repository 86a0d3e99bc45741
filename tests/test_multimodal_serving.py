"""Multimodal (PaliGemma-style) serving through the continuous-batching
engine: image prefix embeddings + prefix-LM attention in paged prefill.

The gold check: engine greedy caption tokens == the model's own jitted
``generate`` (prefix-LM prefill + static-cache decode), token-exact, with
mixed batches of different images and prompt lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

VCFG = vt.SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
TCFG = vt.GemmaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=1, head_dim=32,
                      max_position_embeddings=128, eos_token_id=9999)
PGCFG = vt.PaliGemmaConfig(vision_config=VCFG, text_config=TCFG,
                           projection_dim=64, image_token_index=500)
N_IMG = PGCFG.num_image_tokens
MAX_NEW = 6


@pytest.fixture(scope="module")
def pg():
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _prompt(text_ids):
    return [500] * N_IMG + list(text_ids)


def _engine(pg_model, pg_params, **kw):
    kw.setdefault("num_blocks", 128)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_blocks_per_seq", 16)
    kw.setdefault("max_new_tokens", MAX_NEW)
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("prefill_buckets", (32, 64))
    return ContinuousBatchEngine(
        pg_model.language_model, pg_params["language_model"],
        plus_one=True, position_offset=1, eos_token_id=9999, **kw)


def test_engine_caption_matches_generate(pg):
    model, params = pg
    rng = np.random.RandomState(0)
    pixels = [jax.random.normal(jax.random.PRNGKey(i), (1, 3, 32, 32))
              for i in (1, 2)]
    texts = [list(rng.randint(3, 400, size=5)),
             list(rng.randint(3, 400, size=9))]

    eng = _engine(model, params)
    sids = []
    for px, tx in zip(pixels, texts):
        emb = np.asarray(model.serving_prefix_embeds(params, px))[0]
        sids.append(eng.submit(_prompt(tx), prefix_embeds=emb,
                               prefix_lm=True))
    out = eng.run()

    for sid, px, tx in zip(sids, pixels, texts):
        ids = jnp.asarray([_prompt(tx)], dtype=jnp.int32)
        ref = model.generate(params, ids, px, max_new_tokens=MAX_NEW)
        ref_gen = np.asarray(ref)[0, ids.shape[1]:].tolist()
        assert out[sid] == ref_gen, (out[sid], ref_gen)


def test_device_resident_prefix_embeds_match_host(pg):
    """submit(prefix_embeds=<jax.Array>) (tower output kept on device, no
    host round-trip — r5 caption-serving path) produces the exact tokens
    of the host-fp32 path."""
    model, params = pg
    rng = np.random.RandomState(1)
    pixels = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 32, 32))
    texts = [list(rng.randint(3, 400, size=5)),
             list(rng.randint(3, 400, size=9))]
    embs = model.serving_prefix_embeds(params, pixels)      # [2, N, D]

    eng_d = _engine(model, params)
    sids_d = [eng_d.submit(_prompt(tx), prefix_embeds=embs[i],
                           prefix_lm=True, media_key=f"i{i}")
              for i, tx in enumerate(texts)]
    out_d = eng_d.run()

    eng_h = _engine(model, params)
    sids_h = [eng_h.submit(_prompt(tx),
                           prefix_embeds=np.asarray(embs[i], np.float32),
                           prefix_lm=True, media_key=f"i{i}")
              for i, tx in enumerate(texts)]
    out_h = eng_h.run()
    for sd, sh in zip(sids_d, sids_h):
        assert out_d[sd] == out_h[sh], (out_d[sd], out_h[sh])


def test_prefix_cache_shares_identical_image_prompt(pg):
    model, params = pg
    px = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 32, 32))
    emb = np.asarray(model.serving_prefix_embeds(params, px))[0]
    text = list(range(3, 12))

    eng = _engine(model, params)
    a = eng.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True,
                   media_key="img-3")
    out_a = eng.run()[a]
    assert eng.counters["cached_prompt_tokens"] == 0

    # identical (image, prompt): radix prefix reuse is valid and engages
    b = eng.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True,
                   media_key="img-3")
    out_b = eng.run()[b]
    assert eng.counters["cached_prompt_tokens"] > 0
    assert out_a == out_b

    # same image but different prompt: the whole bidirectional region
    # differs, so NOTHING may be shared (salt covers image AND prompt)
    cached_before = eng.counters["cached_prompt_tokens"]
    eng.submit(_prompt(text[:-1] + [401]), prefix_embeds=emb,
               prefix_lm=True, media_key="img-3")
    eng.run()
    assert eng.counters["cached_prompt_tokens"] == cached_before

    # media_key=None: unique image, never shared even for equal prompts
    eng.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True)
    eng.run()
    assert eng.counters["cached_prompt_tokens"] == cached_before


def test_distinct_images_same_prompt_never_share(pg):
    """Distinct images with the SAME caption prompt have identical token
    ids — the media salt is the only disambiguator, so it must be
    collision-free (the r2 22-bit hash salt could silently serve another
    image's cached KV; interned sequential ids cannot, code-review r3)."""
    model, params = pg
    text = list(range(3, 12))
    eng = _engine(model, params)
    for i in range(4):
        px = jax.random.normal(jax.random.PRNGKey(10 + i), (1, 3, 32, 32))
        emb = np.asarray(model.serving_prefix_embeds(params, px))[0]
        eng.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True,
                   media_key=f"img-{i}")
        eng.run()
    # four distinct (image, prompt) pairs: zero cross-image sharing
    assert eng.counters["cached_prompt_tokens"] == 0
    # interned ids are sequential and engine-unique — never hash-colliding
    assert sorted(eng._media_salts.values()) == [1, 2, 3, 4]

    # a REPEAT of a seen pair still shares (the intern table hits)
    px = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 32, 32))
    emb = np.asarray(model.serving_prefix_embeds(params, px))[0]
    eng.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True,
               media_key="img-0")
    eng.run()
    assert eng.counters["cached_prompt_tokens"] > 0
    assert len(eng._media_salts) == 4


def test_multimodal_tight_pool(pg):
    """A tight pool (queueing / possible preemption): the multimodal
    request must still reproduce the roomy-pool tokens exactly."""
    model, params = pg
    px = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 32, 32))
    emb = np.asarray(model.serving_prefix_embeds(params, px))[0]
    text = list(range(3, 10))

    big = _engine(model, params)
    r = big.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True)
    ref_tokens = big.run()[r]

    small = _engine(model, params, num_blocks=10, max_batch=2)
    s1 = small.submit(_prompt(text), prefix_embeds=emb, prefix_lm=True)
    s2 = small.submit(_prompt(list(range(20, 27))), prefix_embeds=emb,
                      prefix_lm=True)
    out = small.run()
    assert out[s1] == ref_tokens
    assert len(out[s2]) > 0


def test_multimodal_validation(pg):
    model, params = pg
    eng = _engine(model, params)
    with pytest.raises(ValueError, match="prefix_embeds must be"):
        eng.submit(_prompt([3]), prefix_embeds=np.zeros((4, 7)))
    with pytest.raises(ValueError, match="exceed the prompt"):
        eng.submit([3, 4], prefix_embeds=np.zeros((4, 64)))
    with pytest.raises(ValueError, match="largest prefill bucket"):
        eng.submit(_prompt(list(range(3, 60))),
                   prefix_embeds=np.zeros((N_IMG, 64), np.float32),
                   prefix_lm=True)


def test_text_only_engine_unaffected(pg):
    """A text-only request through the same (position-offset) engine uses
    the plain causal path."""
    model, params = pg
    eng = _engine(model, params)
    sid = eng.submit(list(range(3, 20)))
    out = eng.run()[sid]
    assert len(out) == MAX_NEW


# ---------------------------------------------------------------------------
# Embedding serving (serving.embedding — vLLM LLM.embed role)
# ---------------------------------------------------------------------------

def test_embed_batch_matches_single_forward():
    from vyomai_tpu.serving import embed_batch
    cfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                           num_hidden_layers=2, vocab_size=256,
                           max_position_embeddings=64,
                           intermediate_size=128, hidden_dropout_prob=0.0)
    model = vt.EncoderModel(cfg, pos_embedding_type="sinusoidal")
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 256, size=n)) for n in (5, 17, 9, 33)]

    vecs = embed_batch(model, params, prompts, pooling="mean",
                       buckets=(16, 64), batch_size=2)
    assert len(vecs) == 4
    for p, v in zip(prompts, vecs):
        ids = jnp.asarray([p], dtype=jnp.int32)
        h = np.asarray(model.apply(params, ids).logits[0])   # hidden states
        ref = h.mean(0)
        ref = ref / np.linalg.norm(ref)
        np.testing.assert_allclose(v, ref, atol=1e-5)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_embed_batch_decoder_last_pooling(pg):
    from vyomai_tpu.serving import embed_batch
    model, params = pg
    lm, lp = model.language_model, params["language_model"]
    prompts = [[3, 4, 5], [7, 8, 9, 10, 11]]
    vecs = embed_batch(lm, lp, prompts, pooling="last", normalize=False,
                       buckets=(8,), batch_size=4)
    for p, v in zip(prompts, vecs):
        ids = jnp.asarray([p], dtype=jnp.int32)
        ref = np.asarray(lm.apply(lp, ids,
                                  jnp.ones_like(ids)).hidden_state[0, -1])
        np.testing.assert_allclose(v, ref, atol=1e-5)


def test_embed_batch_validation():
    from vyomai_tpu.serving import embed_batch
    cfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                           num_hidden_layers=1, vocab_size=64,
                           max_position_embeddings=64,
                           intermediate_size=128)
    model = vt.EncoderModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="empty"):
        embed_batch(model, params, [[]])
    with pytest.raises(ValueError, match="largest bucket"):
        embed_batch(model, params, [list(range(40))], buckets=(16,))
    with pytest.raises(ValueError, match="pooling"):
        embed_batch(model, params, [[1, 2]], pooling="max")


def test_multimodal_randomized_stress(pg):
    """Randomized mixed multimodal + text schedule through a tight pool
    (admission pressure, radix churn, aborts): every multimodal lane stays
    token-exact vs the model's own generate; no leaked blocks."""
    model, params = pg
    rng = np.random.RandomState(7)
    images = [jax.random.normal(jax.random.PRNGKey(40 + i), (1, 3, 32, 32))
              for i in range(3)]
    embeds = [np.asarray(model.serving_prefix_embeds(params, px))[0]
              for px in images]

    eng = _engine(model, params, num_blocks=24, max_batch=3)
    free0 = eng.kv.num_free()
    reqs = {}
    for i in range(10):
        if rng.random() < 0.6:
            k = int(rng.randint(0, 3))
            text = list(rng.randint(3, 400, size=rng.randint(2, 8)))
            sid = eng.submit(_prompt(text), prefix_embeds=embeds[k],
                             prefix_lm=True, media_key=f"im{k}")
            reqs[sid] = ("mm", k, text)
        else:
            text = list(rng.randint(3, 400, size=rng.randint(2, 12)))
            sid = eng.submit(text)
            reqs[sid] = ("text", None, text)

    aborted = set()
    steps = 0
    while eng.waiting or eng.active or eng.needs_prefill:
        eng.step()
        steps += 1
        if steps % 4 == 0 and rng.random() < 0.4:
            live = [s for s in reqs if s not in aborted
                    and s not in eng.finished]
            if live:
                victim = int(rng.choice(live))
                if eng.abort(victim):
                    aborted.add(victim)
        assert steps < 400, "scheduler failed to drain"

    out = {sid: s.tokens[s.prompt_len:] for sid, s in eng.finished.items()}
    for sid, (kind, k, text) in reqs.items():
        if sid in aborted and sid not in out:
            continue
        assert sid in out
        if kind == "mm":
            ids = jnp.asarray([_prompt(text)], jnp.int32)
            ref = model.generate(params, ids, images[k],
                                 max_new_tokens=MAX_NEW)
            assert out[sid] == np.asarray(ref)[0, ids.shape[1]:].tolist(), \
                (sid, "multimodal lane diverged under stress")
    eng.finished.clear()
    assert eng.kv.num_free() == free0, "leaked blocks"
