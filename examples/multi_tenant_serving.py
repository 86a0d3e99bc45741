"""Multi-tenant serving demo: per-request LoRA adapters + structured
output in ONE continuous batch (beyond the reference's
``simple_vllm.ipynb`` — the production features modern serving stacks
layer on top of paged attention).

One engine serves, simultaneously:
- requests routed to different LoRA adapters over one shared base
  (S-LoRA style: stacked factors gathered per lane, radix prefix cache
  salted per adapter);
- a request constrained to emit JSON matching a schema
  (``fsm_from_json_schema``: schema -> regex -> char DFA -> token FSM,
  masking riding the on-device horizon decode loop);
- plain unconstrained base-model requests.

Synthetic weights and a toy tokenizer by default (self-contained)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

# toy tokenizer: JSON punctuation + digits + a few words; id 0 banned
TOKENS = [None, "{", "}", "[", "]", '"', ":", ",", "-",
          "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
          "true", "false", "null", "label", "score", "ok"]
EOS = len(TOKENS)
TOKENS.append("<eos>")
VOCAB = 64  # spare ids exercise the unconstrained paths
TOK_STRINGS = TOKENS + [None] * (VOCAB - len(TOKENS))


def detok(ids):
    return "".join(TOK_STRINGS[t] or f"<{t}>" for t in ids if t != EOS)


def main():
    cfg = vt.QwenConfig(vocab_size=VOCAB, hidden_size=128,
                        intermediate_size=256, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=32, max_position_embeddings=256,
                        eos_token_id=EOS)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    # two "tenants": independently fine-tuned LoRA adapters (random factors
    # stand in for training — see examples/adapters_and_distillation.py)
    adapters = []
    for i in range(2):
        ad = vt.inject_lora(params, jax.random.PRNGKey(10 + i), rank=8,
                            alpha=2.0)
        ad["tree"] = jax.tree_util.tree_map(
            lambda x: (jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(40 + i), x.size),
                x.shape) * 0.2).astype(x.dtype), ad["tree"])
        adapters.append(ad)

    # structured output grammar: {"label":<0|1|2>,"score":<bool>}
    schema = {"type": "object",
              "properties": {"label": {"enum": [0, 1, 2]},
                             "score": {"type": "boolean"}},
              "required": ["label", "score"]}
    print("schema regex:", vt.json_schema_to_regex(schema))
    fsm = vt.fsm_from_json_schema(schema, TOK_STRINGS, EOS)
    print(f"token FSM: {fsm.num_states} states x {fsm.vocab_size} vocab")

    eng = ContinuousBatchEngine(model, params, num_blocks=128, block_size=16,
                                max_batch=4, max_new_tokens=24,
                                dtype=jnp.float32,
                                loras=adapters, fsms=[fsm])
    rng = np.random.default_rng(0)
    prompt = lambda: list(rng.integers(1, 20, size=6))
    reqs = {
        "tenant-0 (lora_id=0)":     eng.submit(prompt(), lora_id=0),
        "tenant-1 (lora_id=1)":     eng.submit(prompt(), lora_id=1),
        "structured (fsm_id=0)":    eng.submit(prompt(), fsm_id=0),
        "base (unconstrained)":     eng.submit(prompt()),
    }
    out = eng.run()
    print("\none batch, four tenants/modes:")
    for name, sid in reqs.items():
        toks = out[sid]
        print(f"  {name:26s} -> {toks}")
        if "structured" in name:
            import json
            obj = json.loads(detok(toks))
            assert obj["label"] in (0, 1, 2) and isinstance(
                obj["score"], bool)
            print(f"  {'':26s}    = {detok(toks)}  (schema-valid)")


if __name__ == "__main__":
    main()
