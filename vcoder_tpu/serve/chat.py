"""In-process chat worker: base64 images in, JSON text chunks out.

Mirrors the reference ``Chat`` protocol (reference:
vcoder_llava/serve/chat.py:19-185): sentinel-count validation against the
prompt, token-budget clamp counting 576 vision tokens per modality, the
same stop-string/stream semantics, and the error-swallowing
``generate_stream_gate`` wrapper.
"""

from __future__ import annotations

import base64
import dataclasses
import json
from io import BytesIO
from typing import Iterator, List, Optional

from vcoder_tpu import generation as gen_mod
from vcoder_tpu.builder import load_pretrained_model
from vcoder_tpu.constants import (
    DEFAULT_DEPTH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_SEG_TOKEN,
)
from vcoder_tpu.mm_tokens import (
    get_model_name_from_path,
    tokenizer_depth_seg_token,
    tokenizer_image_token,
    tokenizer_seg_token,
)
from vcoder_tpu.utils import build_logger, server_error_msg

logger = build_logger("chat", "chat.log")


def load_image_from_base64(image: str):
    from PIL import Image

    return Image.open(BytesIO(base64.b64decode(image)))


@dataclasses.dataclass
class PreparedRequest:
    """A wire-protocol params dict resolved into model inputs: sentinel
    ids spliced, pixels preprocessed, and the token budget clamped —
    everything a generation backend (host stream loop or batch engine)
    needs, with the validation already done."""

    ori_prompt: str
    input_ids: List[int]
    images: Optional[object]  # [1, N?, H, W, C] arrays or None
    segs: Optional[object]
    depths: Optional[object]
    max_new_tokens: int
    temperature: float
    top_p: float
    stop_str: Optional[str]
    budget_error: Optional[str] = None  # set when the context is full
    lora: Optional[str] = None  # adapter name (multi-LoRA engine worker)


class Chat:
    def __init__(
        self,
        model_path: str,
        model_base=None,
        model_name=None,
        load_8bit: bool = False,
        load_4bit: bool = False,
        device: str = "tpu",
        tokenizer=None,
    ):
        if model_name is None:
            model_name = get_model_name_from_path(model_path)
        self.model_name = model_name
        (
            self.tokenizer,
            self.model,
            self.image_processor,
            self.seg_image_processor,
            self.depth_image_processor,
            self.context_len,
        ) = load_pretrained_model(
            model_path,
            model_base,
            model_name,
            load_8bit,
            load_4bit,
            device=device,
            tokenizer=tokenizer,
        )
        self.is_multimodal = "llava" in self.model_name.lower()
        # Seg/depth support inferred from the name, as the reference does
        # (chat.py:37-39).
        self.is_seg = "vcoder" in self.model_name.lower()
        self.is_depth = "ds" in self.model_name.lower()
        self.device = device

    @property
    def num_patches(self) -> int:
        return self.model.config.vision.num_patches

    def prepare(self, params: dict) -> PreparedRequest:
        """Validate + preprocess one request (reference semantics:
        sentinel-count checks, 576-per-modality budget clamp,
        vcoder_llava/serve/chat.py:53-139). Raises ValueError on
        sentinel/image mismatches; a full context comes back as
        ``budget_error`` (the reference streams that as a normal
        message, not an error)."""
        tokenizer = self.tokenizer
        prompt = params["prompt"]
        ori_prompt = prompt
        images = params.get("images", None)
        segs = params.get("segs", None)
        depths = params.get("depths", None)
        num_image_tokens = num_seg_tokens = num_depth_tokens = 0

        px_images = px_segs = px_depths = None
        if images is not None and len(images) > 0 and self.is_multimodal:
            if len(images) != prompt.count(DEFAULT_IMAGE_TOKEN):
                raise ValueError(
                    "Number of images does not match number of <image>"
                    " tokens in prompt"
                )
            pil_images = [load_image_from_base64(im) for im in images]
            px_images = self.image_processor.preprocess(pil_images)[
                "pixel_values"
            ]
            # One conversation row: N images are N sentinel occurrences,
            # not a batch — [N, H, W, C] -> [1, N, H, W, C].
            if len(pil_images) > 1:
                px_images = px_images[None]
            num_image_tokens = (
                prompt.count(DEFAULT_IMAGE_TOKEN) * self.num_patches
            )

            if segs is not None and len(segs) > 0 and self.is_seg:
                if len(segs) != prompt.count(DEFAULT_SEG_TOKEN):
                    raise ValueError(
                        "Number of segs does not match number of <seg>"
                        " tokens in prompt"
                    )
                pil_segs = [load_image_from_base64(s) for s in segs]
                px_segs = self.seg_image_processor.preprocess(pil_segs)[
                    "pixel_values"
                ]
                if len(pil_segs) > 1:
                    px_segs = px_segs[None]
                num_seg_tokens = (
                    prompt.count(DEFAULT_SEG_TOKEN) * self.num_patches
                )

                if depths is not None and len(depths) > 0 and self.is_depth:
                    if len(depths) != prompt.count(DEFAULT_DEPTH_TOKEN):
                        raise ValueError(
                            "Number of depths does not match number of"
                            " <depth> tokens in prompt"
                        )
                    pil_depths = [load_image_from_base64(d) for d in depths]
                    px_depths = self.depth_image_processor.preprocess(
                        pil_depths
                    )["pixel_values"]
                    if len(pil_depths) > 1:
                        px_depths = px_depths[None]
                    num_depth_tokens = (
                        prompt.count(DEFAULT_DEPTH_TOKEN) * self.num_patches
                    )

        temperature = float(params.get("temperature", 1.0))
        top_p = float(params.get("top_p", 1.0))
        max_context_length = self.model.config.text.max_position_embeddings
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop", None)

        if self.is_seg and px_segs is not None:
            if self.is_depth and px_depths is not None:
                input_ids = tokenizer_depth_seg_token(prompt, tokenizer)
            else:
                input_ids = tokenizer_seg_token(prompt, tokenizer)
        else:
            input_ids = tokenizer_image_token(prompt, tokenizer)
            px_segs = px_depths = None

        max_new_tokens = min(
            max_new_tokens,
            max_context_length
            - len(input_ids)
            - num_image_tokens
            - num_seg_tokens
            - num_depth_tokens,
        )
        budget_error = None
        if max_new_tokens < 1:
            budget_error = (
                "Exceeds max token length. Please start a new"
                " conversation, thanks."
            )
        return PreparedRequest(
            ori_prompt=ori_prompt,
            input_ids=list(input_ids),
            images=px_images,
            segs=px_segs,
            depths=px_depths,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            stop_str=stop_str,
            budget_error=budget_error,
            lora=params.get("lora"),
        )

    def generate_stream(self, params: dict) -> Iterator[bytes]:
        prep = self.prepare(params)
        ori_prompt, stop_str = prep.ori_prompt, prep.stop_str
        if prep.budget_error is not None:
            yield json.dumps(
                {
                    "text": ori_prompt + prep.budget_error,
                    "error_code": 0,
                }
            ).encode() + b"\0"
            return

        generated_text = ori_prompt
        for text in gen_mod.generate_stream(
            self.model.params,
            self.model.config,
            [prep.input_ids],
            prep.images,
            prep.segs,
            prep.depths,
            tokenizer=self.tokenizer,
            max_new_tokens=prep.max_new_tokens,
            temperature=prep.temperature,
            top_p=prep.top_p,
            stop_str=stop_str,
            # Greedy requests stream through prompt-lookup speculative
            # decoding (several tokens per decoder dispatch). An explicit
            # 0/1 disables speculation (exact-parity debugging); only a
            # missing/None key falls back to the default of 8.
            lookahead=int(
                8 if params.get("lookahead", 8) is None
                else params.get("lookahead", 8)
            ),
        ):
            generated_text = ori_prompt + text
            if stop_str and generated_text.endswith(stop_str):
                generated_text = generated_text[: -len(stop_str)]
            # Uniform NUL-delimited framing (the budget_error path and
            # the reference wire format both delimit every chunk).
            yield json.dumps(
                {"text": generated_text, "error_code": 0}
            ).encode() + b"\0"

    def generate_stream_gate(self, params: dict) -> Iterator[bytes]:
        try:
            for x in self.generate_stream(params):
                yield x
        except ValueError as e:
            print("Caught ValueError:", e)
            yield json.dumps(
                {"text": server_error_msg, "error_code": 1}
            ).encode() + b"\0"
        except Exception as e:
            print("Caught Unknown Error", e)
            yield json.dumps(
                {"text": server_error_msg, "error_code": 1}
            ).encode() + b"\0"
