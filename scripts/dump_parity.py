#!/usr/bin/env python3
"""Dump parity fixtures in the reference JSON schema.

Two producers, one schema (the reference's upstream-dump contract,
`/root/reference/scripts/dump_python_parity.py:106-196`, consumed here by
`go_pocket_tts_tpu/tts/parity_fixture.py` and by the reference's own Go tests):

1. ``--upstream /path/to/pockettts-checkout`` — dump from the actual upstream
   ``pocket_tts`` PyTorch package (the real oracle; needs the real checkpoint
   + the upstream checkout installed). Use this the day assets land:

       python scripts/dump_parity.py --upstream original/pockettts \
           --output tests/parity/upstream.json
       POCKETTTS_PARITY_FIXTURE=tests/parity/upstream.json pytest tests/test_parity_fixture.py

2. ``--backend torch-oracle --model ckpt.safetensors`` — dump from the in-repo
   independent torch engine (`tts/runtime_torch.py`). No upstream needed; this
   is how the fixture loader itself is exercised in CI (synthetic weights).

Fixture schema::

    {"source": {...},
     "flow_lm_prefill_step": {"tokens", "step_latent", "prompt_layer_offsets",
                              "step_layer_offsets", "step_last_hidden",
                              "step_eos_logits"},
     "mimi": [{"name", "latent", "latent_to_mimi", "mimi_decode"}, ...]}

Tensors are ``{"shape": [...], "data": [flat floats]}``. Pseudo-inputs are the
schema's deterministic ramp ``((i % 23) - 11) * scale`` (step latent scale
0.05, mimi latent scale 0.03) so independently produced dumps are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def det_ramp(shape, scale: float):
    import numpy as np

    n = 1
    for d in shape:
        n *= d
    vals = (np.arange(n, dtype=np.float32) % 23 - 11) * scale
    return vals.reshape(shape)


def tensor_json(arr) -> Dict[str, Any]:
    import numpy as np

    a = np.asarray(arr, np.float32)
    return {"shape": list(a.shape), "data": [float(x) for x in a.reshape(-1)]}


# -- producer 1: upstream pocket_tts ------------------------------------------


def dump_from_upstream(args) -> Dict[str, Any]:
    sys.path.insert(0, os.path.abspath(args.upstream))
    import torch
    from pocket_tts.conditioners.base import TokenizedText
    from pocket_tts.models.tts_model import TTSModel
    from pocket_tts.modules.stateful_module import increment_steps, init_states

    torch.set_num_threads(1)
    torch.manual_seed(args.seed)
    model = TTSModel.load_model(language=args.language)
    model.eval()
    flow = model.flow_lm
    mimi = model.mimi

    tokens = [int(t) for t in args.flow_tokens.split(",")]
    with torch.no_grad():
        text = torch.tensor([tokens], dtype=torch.int64, device=flow.device)
        emb = flow.conditioner(TokenizedText(text))
        state = init_states(flow, batch_size=1, sequence_length=args.cache_length)
        flow.transformer(emb, state)
        increment_steps(flow, state, increment=emb.shape[1])
        prompt_offsets = _offsets(state)

        latent = torch.from_numpy(det_ramp((1, 1, flow.ldim), 0.05))
        x = flow.input_linear(latent)
        y = flow.transformer(x, state)
        increment_steps(flow, state, increment=x.shape[1])
        step_offsets = _offsets(state)
        y = flow.out_norm(y.to(torch.float32))
        last = y[:, -1]
        eos = flow.out_eos(last)

    flow_case = {
        "tokens": tokens,
        "step_latent": tensor_json(latent.numpy()),
        "prompt_layer_offsets": prompt_offsets,
        "step_layer_offsets": step_offsets,
        "step_last_hidden": tensor_json(last.numpy()),
        "step_eos_logits": tensor_json(eos.numpy()),
    }

    mimi_cases: List[Dict[str, Any]] = []
    for frames in (int(f) for f in args.mimi_frames.split(",")):
        with torch.no_grad():
            lat = torch.from_numpy(det_ramp((1, frames, flow.ldim), 0.03))
            q = mimi.quantizer((lat * flow.emb_std + flow.emb_mean).transpose(-1, -2))
            steps = int(mimi.encoder_frame_rate / mimi.frame_rate)
            mstate = init_states(
                mimi, batch_size=1, sequence_length=max(args.cache_length, frames * steps)
            )
            audio = mimi.decode_from_latent(q, mstate)
        mimi_cases.append(
            {
                "name": f"{frames}_frames",
                "latent": tensor_json(lat.numpy()),
                "latent_to_mimi": tensor_json(q.numpy()),
                "mimi_decode": tensor_json(audio.numpy()),
            }
        )

    return {
        "source": {"producer": "upstream", "upstream": args.upstream, "seed": args.seed},
        "flow_lm_prefill_step": flow_case,
        "mimi": mimi_cases,
    }


def _offsets(state) -> List[int]:
    out = []
    for _, mod_state in sorted(state.items()):
        off = mod_state.get("offset")
        if off is not None:
            out.append(int(off.reshape(-1)[0].item()))
    return out


# -- producer 2: in-repo torch oracle ------------------------------------------


def dump_from_torch_oracle(args) -> Dict[str, Any]:
    import torch

    from go_pocket_tts_tpu.tts.runtime_torch import TorchRuntime

    rt = TorchRuntime.from_checkpoint(args.model, num_heads=args.num_heads)
    L = rt.L
    tokens = [int(t) for t in args.flow_tokens.split(",")]

    with torch.no_grad():
        ids = torch.tensor(tokens, dtype=torch.long)
        emb = L("flow_lm.conditioner.embed.weight")[ids][None]
        kv = [None] * rt.n_layers
        x = emb
        for i in range(rt.n_layers):
            x = rt._attn_layer(
                f"flow_lm.transformer.layers.{i}", x, kv, i, 0, rt.num_heads
            )
        prompt_offsets = [emb.shape[1]] * rt.n_layers

        latent = torch.from_numpy(det_ramp((1, 1, rt.latent_dim), 0.05))
        x = L.linear("flow_lm.input_linear", latent)
        for i in range(rt.n_layers):
            x = rt._attn_layer(
                f"flow_lm.transformer.layers.{i}", x, kv, i, emb.shape[1], rt.num_heads
            )
        step_offsets = [emb.shape[1] + 1] * rt.n_layers
        y = L.layer_norm("flow_lm.out_norm", x)
        last = y[:, -1]
        eos = L.linear("flow_lm.out_eos", last)

    flow_case = {
        "tokens": tokens,
        "step_latent": tensor_json(latent.numpy()),
        "prompt_layer_offsets": prompt_offsets,
        "step_layer_offsets": step_offsets,
        "step_last_hidden": tensor_json(last.numpy()),
        "step_eos_logits": tensor_json(eos.numpy()),
    }

    mimi_cases: List[Dict[str, Any]] = []
    for frames in (int(f) for f in args.mimi_frames.split(",")):
        with torch.no_grad():
            lat = torch.from_numpy(det_ramp((1, frames, rt.latent_dim), 0.03))
            denorm = lat * L("flow_lm.emb_std") + L("flow_lm.emb_mean")
            w = L("mimi.quantizer.output_proj.weight")[:, :, 0]
            q = torch.einsum("oc,btc->bot", w, denorm)
            if L.has("mimi.quantizer.output_proj.bias"):
                q = q + L("mimi.quantizer.output_proj.bias")[None, :, None]
            audio = rt._mimi_decode(q)
        mimi_cases.append(
            {
                "name": f"{frames}_frames",
                "latent": tensor_json(lat.numpy()),
                "latent_to_mimi": tensor_json(q.numpy()),
                "mimi_decode": tensor_json(audio.numpy()),
            }
        )

    return {
        "source": {"producer": "torch-oracle", "model": args.model},
        "flow_lm_prefill_step": flow_case,
        "mimi": mimi_cases,
    }


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", choices=("upstream", "torch-oracle"), default="upstream")
    p.add_argument("--upstream", default="original/pockettts")
    p.add_argument("--language", default="english_2026-01")
    p.add_argument("--model", help="safetensors checkpoint (torch-oracle backend)")
    p.add_argument("--num-heads", type=int, default=16)
    p.add_argument("--output", required=True)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--flow-tokens", default="10,20,30")
    p.add_argument("--cache-length", type=int, default=64)
    p.add_argument("--mimi-frames", default="1,2,4")
    args = p.parse_args()

    if args.backend == "upstream":
        fixture = dump_from_upstream(args)
    else:
        if not args.model:
            p.error("--backend torch-oracle requires --model")
        fixture = dump_from_torch_oracle(args)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as fh:
        json.dump(fixture, fh)
    print(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
