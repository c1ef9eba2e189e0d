"""Reward callbacks: name-addressed factories returning score functions.

Registry parity with the reference (ddpo/training/callbacks.py:549-564):
vae, aesthetic, consistency, jpeg, neg_jpeg, rotational, rotational_corr,
mirror, mirror_corr, thumbnail, arange, vqa, llava_vqa, llava_bertscore.

Each factory returns fn(images, prompts, metadata) -> (scores, info) where
images are (N, H, W, 3) float in [0, 1]. evaluate_callbacks runs every
registered fn, choosing a random training prompt per sample when prompts are
lists (reference :540-546).

Environment notes (zero-egress):
  - model-based rewards (aesthetic/consistency/rotational/thumbnail/vqa) need
    local weights; factories accept explicit params and raise a clear error
    when none are available instead of downloading.
  - llava_* talk to an external HTTP server (reference README.md:49-51) with
    the same 1000-retry/backoff policy (reference :411-415).
  - jpeg/neg_jpeg/mirror*/rotational_corr/arange are dependency-free.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ddpo_tpu.utils.images import encode_jpeg

RewardFn = Callable[[np.ndarray, list, list], Tuple[np.ndarray, dict]]

# CLIP image preprocessing constants (OpenAI CLIP normalization)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def clip_preprocess(images: np.ndarray, size: int = 224) -> np.ndarray:
    """(N, H, W, 3) in [0,1] -> (N, 3, size, size) CLIP-normalized.

    Bicubic resize to size x size (prompt images are square), matching
    CLIPProcessor's resize+center-crop+normalize on square inputs.
    """
    from PIL import Image

    out = np.empty((len(images), size, size, 3), dtype=np.float32)
    for i, img in enumerate(images):
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        out[i] = np.asarray(pil.resize((size, size), Image.BICUBIC)) / 255.0
    out = (out - CLIP_MEAN) / CLIP_STD
    return out.transpose(0, 3, 1, 2)


# ------------------------------ dependency-free ------------------------------ #


def jpeg_fn(jit=False, **kwargs) -> RewardFn:
    """Negative JPEG size in KB: reward for compressible images.

    Encodes the whole batch through the native multithreaded libjpeg path
    (ddpo_tpu/native) — the per-image PIL loop of the reference is the
    host-side bottleneck between sampling batches at production batch sizes.
    """
    from ddpo_tpu.native import jpeg_sizes

    def _fn(images, prompts, metadata):
        del prompts, metadata
        sizes_kb = jpeg_sizes(images, quality=95) / 1000.0
        return -np.asarray(sizes_kb, dtype=np.float64)[:, None], {}

    return _fn


def neg_jpeg_fn(*args, **kwargs) -> RewardFn:
    _jpeg = jpeg_fn(*args, **kwargs)

    def _fn(*a, **kw):
        scores, infos = _jpeg(*a, **kw)
        return -scores, infos

    return _fn


def arange_fn(jit=False, **kwargs) -> RewardFn:
    """Debug reward: the sample index (plumbing test, reference :347-354)."""

    def _fn(images, prompts, metadata):
        del prompts, metadata
        return np.arange(len(images))[:, None], {}

    return _fn


def mirror_symmetry_fn(jit=False, **kwargs) -> RewardFn:
    """Negative MSE between the image and its horizontal mirror."""

    def _fn(images, prompts, metadata):
        del prompts, metadata
        imgs = (np.clip(images, 0, 1) * 255).astype(np.uint8).astype(np.int64)
        mirrored = imgs[:, :, ::-1]
        scores = ((imgs - mirrored) ** 2).mean(axis=(1, 2, 3)).astype(np.float64)
        return -scores, {}

    return _fn


def _cov(X, Y):
    assert X.ndim == Y.ndim == 2
    return ((X - X.mean(-1, keepdims=True)) * (Y - Y.mean(-1, keepdims=True))).sum(-1)


def mirror_correlation_fn(jit=False, **kwargs) -> RewardFn:
    """Negative Pearson correlation between image and its mirror."""

    def _fn(images, prompts, metadata):
        del prompts, metadata
        imgs = np.clip(images, 0, 1).astype(np.float32)
        mirrored = imgs[:, :, ::-1]
        flat = imgs.reshape(len(images), -1)
        mflat = mirrored.reshape(len(images), -1)
        scores = _cov(flat, mflat) / np.sqrt(_cov(flat, flat) * _cov(mflat, mflat))
        return -scores, {}

    return _fn


def rotational_correlation_fn(jit=False, **kwargs) -> RewardFn:
    """Negative MSE between the image and its 180-degree rotation."""

    def _fn(images, prompts, metadata):
        del prompts, metadata
        imgs = (np.clip(images, 0, 1) * 255).astype(np.uint8).astype(np.int64)
        rotated = imgs[:, ::-1, ::-1]
        scores = ((imgs - rotated) ** 2).mean(axis=(1, 2, 3)).astype(np.float64)
        return -scores, {}

    return _fn


# ------------------------------- model-based -------------------------------- #


def _require(value, what: str, hint: str):
    if value is None:
        raise RuntimeError(
            f"{what} unavailable: {hint}. Model-based rewards need local "
            "weights in this zero-egress environment."
        )
    return value


def vae_fn(vae=None, vae_params=None, jit=True, **kwargs) -> RewardFn:
    """Encode images to VAE posterior moments, stored for RWR training.

    Output layout matches the reference (training/callbacks.py:37-57):
    channel-last concat of (mean, logvar), i.e. (N, h, w, 8).
    """
    import jax
    import jax.numpy as jnp

    _require(vae, "VAE", "pass vae=/vae_params= to callback factory")

    @jax.jit
    def _encode(images):
        x = images.transpose(0, 3, 1, 2)  # NHWC [0,1] -> NCHW
        x = (x - 0.5) / 0.5
        moments = vae.apply({"params": vae_params}, x, method=vae.encode)
        mean, logvar = jnp.split(moments, 2, axis=1)
        # channel-last, (mean, logvar) concat on the last axis
        return jnp.concatenate(
            [mean.transpose(0, 2, 3, 1), logvar.transpose(0, 2, 3, 1)], axis=-1
        )

    def _fn(images, prompts, metadata):
        del prompts, metadata
        return np.asarray(_encode(jnp.asarray(images))), {}

    return _fn


def _clip_image_features_fn(clip_params=None):
    """Build a jitted (N,3,224,224) -> (N, 768) CLIP ViT-L/14 feature fn."""
    import jax
    import jax.numpy as jnp

    from ddpo_tpu.models.clip import CLIPImageEncoder

    _require(clip_params, "CLIP ViT-L/14 weights", "pass clip_params=")
    encoder = CLIPImageEncoder()

    @jax.jit
    def _features(pixels):
        return encoder.apply({"params": clip_params}, pixels)

    return _features


def aesthetic_fn(clip_params=None, mlp_params=None, cache="cache", jit=True, **kwargs) -> RewardFn:
    """LAION aesthetic score: CLIP ViT-L/14 features -> 5-layer MLP.

    Reference :60-95. MLP weights come from the torch checkpoint
    sac+logos+ava1-l14-linearMSE.pth via models/aesthetic.load_weights
    (local cache only).
    """
    import jax.numpy as jnp

    from ddpo_tpu.models.aesthetic import AestheticClassifier, load_weights

    features_fn = _clip_image_features_fn(clip_params)
    if mlp_params is None:
        mlp_params = load_weights(cache=cache)

    classifier = AestheticClassifier()

    def _fn(images, prompts, metadata):
        del prompts, metadata
        pixels = clip_preprocess(images)
        feats = np.asarray(features_fn(jnp.asarray(pixels)))
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        scores = classifier.apply(mlp_params, feats)
        return np.asarray(scores), {}

    return _fn


def _multi_view_angle_fn(make_views, clip_params=None) -> RewardFn:
    """Shared scorer: mean CLIP-embedding angle between image and views."""
    import jax.numpy as jnp

    features_fn = _clip_image_features_fn(clip_params)

    def _fn(images, prompts, metadata):
        del prompts, metadata
        views = make_views(images)  # list of (N,H,W,3) incl. original first
        feats = []
        for v in views:
            f = np.asarray(features_fn(jnp.asarray(clip_preprocess(v))))
            feats.append(f)
        base = feats[0]
        scores = 0.0
        for f in feats[1:]:
            numer = (base * f).sum(axis=-1)
            denom = np.linalg.norm(base, axis=-1) * np.linalg.norm(f, axis=-1)
            theta = np.arccos(np.clip(numer / denom, 0, 1)) * 180 / np.pi
            scores = scores + theta
        scores = scores / (len(feats) - 1)
        return -scores, {}

    return _fn


def rotational_symmetry_fn(clip_params=None, jit=True, **kwargs) -> RewardFn:
    """Mean CLIP angle across 90/180/270-degree rotations (reference :166-213)."""

    def make_views(images):
        views = [images]
        for k in (1, 2, 3):  # 90, 180, 270 degrees
            views.append(np.rot90(images, k=k, axes=(1, 2)))
        return views

    return _multi_view_angle_fn(make_views, clip_params)


def thumbnail_fn(clip_params=None, jit=True, **kwargs) -> RewardFn:
    """Mean CLIP angle across 4x/8x/16x downsamples (reference :295-344)."""

    def make_views(images):
        from PIL import Image

        views = [images]
        h, w = images.shape[1:3]
        for d in (4, 8, 16):
            small = []
            for img in images:
                pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
                small.append(
                    np.asarray(pil.resize((w // d, h // d))) / 255.0
                )
            views.append(np.stack(small).astype(np.float32))
        return views

    return _multi_view_angle_fn(make_views, clip_params)


def consistency_fn(
    clip_model_params=None,
    tokenizer=None,
    jit=False,
    vision_config=None,
    text_config=None,
    **kwargs,
) -> RewardFn:
    """CLIP image-text logit diagonal (prompt alignment, reference :122-140).

    Needs a full CLIPModel (vision + text + projections + logit_scale) and a
    tokenizer; both must be provided locally. Defaults to the ViT-B/32
    geometry the reference uses for this reward
    (reference training/callbacks.py:125-128: "openai/clip-vit-base-patch32");
    pass vision_config/text_config to score with a different CLIP variant
    (e.g. VIT_L_14/SD14_TEXT, which the aesthetic reward shares).
    """
    import jax
    import jax.numpy as jnp

    from ddpo_tpu.models.clip import (
        B32_TEXT,
        VIT_B_32,
        CLIPImageEncoder,
        CLIPTextModel,
    )

    params = _require(clip_model_params, "CLIP model weights", "pass clip_model_params=")
    tokenizer = _require(tokenizer, "CLIP tokenizer", "pass tokenizer=")

    image_encoder = CLIPImageEncoder(vision_config or VIT_B_32)
    text_encoder = CLIPTextModel(text_config or B32_TEXT)

    @jax.jit
    def _score(pixels, input_ids):
        img = image_encoder.apply(
            {"params": {
                "vision_model": params["vision_model"],
                "visual_projection": params["visual_projection"],
            }},
            pixels,
        )
        txt_hidden = text_encoder.apply(
            {"params": {"text_model": params["text_model"]}}, input_ids
        )
        # pooled = hidden state at the EOT token (argmax of ids per row)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = txt_hidden[jnp.arange(txt_hidden.shape[0]), eot]
        txt = pooled @ params["text_projection"]["kernel"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"])
        return scale * jnp.sum(img * txt, axis=-1)

    def _fn(images, prompts, metadata):
        del metadata
        pixels = jnp.asarray(clip_preprocess(images))
        ids = jnp.asarray(tokenizer(list(prompts)))
        logits = _score(pixels, ids)
        return np.asarray(logits)[:, None], {}

    return _fn


def diversity_fn(clip_params=None, jit=False, **kwargs) -> RewardFn:
    """Mean pairwise CLIP feature distance across the batch (reference :98-119)."""
    import jax.numpy as jnp

    features_fn = _clip_image_features_fn(clip_params)

    def _fn(images, prompts, metadata):
        del prompts, metadata
        feats = np.asarray(features_fn(jnp.asarray(clip_preprocess(images))))
        n_pairs = 10000
        idx1 = np.random.randint(0, len(feats), (n_pairs,))
        idx2 = np.random.randint(0, len(feats), (n_pairs,))
        dist = np.linalg.norm(feats[idx1] - feats[idx2], axis=-1)
        return dist.mean(), {}

    return _fn


# --------------------------------- VQA rewards ------------------------------- #


def single_satisfaction(outputs, answers) -> np.ndarray:
    assert len(outputs) == len(answers)
    return np.array([ans in out for ans, out in zip(answers, outputs)], dtype=int)


def vqa_satisfaction(model_name="Salesforce/blip2-opt-2.7b", jit=False, **kwargs) -> RewardFn:
    """Local BLIP2 VQA scoring on host CPU via torch (reference :363-399)."""
    import torch
    import transformers

    processor = transformers.AutoProcessor.from_pretrained(model_name)
    vlm = transformers.Blip2ForConditionalGeneration.from_pretrained(
        model_name, torch_dtype=torch.float32
    )

    def _fn(images, prompts, metadata):
        n_questions = len(metadata[0]["questions"])
        images_u8 = (np.clip(images, 0, 1) * 255).astype(np.uint8)

        questions = [
            f'Question: {m["questions"][i]} Answer:'
            for m in metadata
            for i in range(n_questions)
        ]
        answers = [m["answers"][i] for m in metadata for i in range(n_questions)]
        images_rep = [img for img in images_u8 for _ in range(n_questions)]

        inputs = processor(
            images_rep, text=questions, return_tensors="pt", padding="longest"
        )
        generated = vlm.generate(**inputs, max_new_tokens=8)
        text = [t.strip() for t in processor.batch_decode(generated, skip_special_tokens=True)]

        correct = single_satisfaction(text, answers)
        scores = correct.reshape(len(images), n_questions).mean(-1, keepdims=True)
        return scores, {}

    return _fn


def _llava_session(url: str):
    import requests
    from requests.adapters import HTTPAdapter, Retry

    sess = requests.Session()
    retries = Retry(
        total=1000, backoff_factor=1, status_forcelist=[500], allowed_methods=False
    )
    sess.mount("http://", HTTPAdapter(max_retries=retries))
    return sess


def _jpeg_bytes(image_batch: np.ndarray, quality: int = 80):
    import io

    from PIL import Image

    out = []
    for image in image_batch:
        buffer = io.BytesIO()
        Image.fromarray(image).save(buffer, format="JPEG", quality=quality)
        out.append(buffer.getvalue())
    return out


def llava_vqa_satisfaction(url="http://127.0.0.1:8085", batch_size=4, jit=False, **kwargs) -> RewardFn:
    """Remote LLaVA VQA over HTTP+pickle (reference :402-462)."""
    import pickle

    sess = _llava_session(url)

    def _fn(images, prompts, metadata):
        del prompts
        images_u8 = (np.clip(images, 0, 1) * 255).astype(np.uint8)
        n_batches = int(np.ceil(len(images_u8) / batch_size))
        images_batched = np.array_split(images_u8, n_batches)
        metadata_batched = np.array_split(np.asarray(metadata, dtype=object), n_batches)

        all_scores, all_answers = [], []
        for image_batch, metadata_batch in zip(images_batched, metadata_batched):
            data = {
                "images": _jpeg_bytes(image_batch),
                "queries": [m["questions"] for m in metadata_batch],
            }
            response = sess.post(url, data=pickle.dumps(data), timeout=120)
            response_data = pickle.loads(response.content)
            correct = [
                single_satisfaction(ans, m["answers"])
                for ans, m in zip(response_data["outputs"], metadata_batch)
            ]
            all_scores += np.array(correct).mean(axis=-1).tolist()
            all_answers += response_data["outputs"]

        return np.array(all_scores), {"answers": np.array(all_answers, dtype=object)}

    return _fn


def llava_bertscore(url="http://127.0.0.1:8085", batch_size=16, jit=False, **kwargs) -> RewardFn:
    """Remote LLaVA captioning scored by BERTScore recall (reference :465-537)."""
    import pickle

    sess = _llava_session(url)

    def _fn(images, prompts, metadata):
        del metadata
        images_u8 = (np.clip(images, 0, 1) * 255).astype(np.uint8)
        n_batches = int(np.ceil(len(images_u8) / batch_size))
        images_batched = np.array_split(images_u8, n_batches)
        prompts_batched = np.array_split(np.asarray(prompts, dtype=object), n_batches)

        all_scores = []
        all_info = {"precision": [], "f1": [], "outputs": []}
        for image_batch, prompt_batch in zip(images_batched, prompts_batched):
            data = {
                "images": _jpeg_bytes(image_batch),
                "queries": [["Answer concisely: what is going on in this image?"]]
                * len(image_batch),
                "answers": [
                    [f"The image contains {prompt}"] for prompt in prompt_batch
                ],
            }
            response = sess.post(url, data=pickle.dumps(data), timeout=120)
            response_data = pickle.loads(response.content)

            def _flat(x):
                # single-image batches squeeze to scalars; keep 1-d
                return np.atleast_1d(np.asarray(x).squeeze()).tolist()

            all_scores += _flat(response_data["recall"])
            all_info["precision"] += _flat(response_data["precision"])
            all_info["f1"] += _flat(response_data["f1"])
            all_info["outputs"] += _flat(response_data["outputs"])

        return np.array(all_scores), {k: np.array(v) for k, v in all_info.items()}

    return _fn


# ---------------------------------- registry --------------------------------- #


def evaluate_callbacks(fns: Dict[str, RewardFn], images, prompts, metadata):
    """Run every registered reward fn (reference :540-546)."""
    if len(prompts) and isinstance(prompts[0], (list, tuple)):
        prompts = [random.choice(p) for p in prompts]
    images = np.asarray(images, dtype=np.float32)
    return {key: fn(images, prompts, metadata) for key, fn in fns.items()}


callback_fns: Dict[str, Callable[..., RewardFn]] = {
    "vae": vae_fn,
    "aesthetic": aesthetic_fn,
    "consistency": consistency_fn,
    "jpeg": jpeg_fn,
    "neg_jpeg": neg_jpeg_fn,
    "rotational": rotational_symmetry_fn,
    "rotational_corr": rotational_correlation_fn,
    "mirror": mirror_symmetry_fn,
    "mirror_corr": mirror_correlation_fn,
    "thumbnail": thumbnail_fn,
    "arange": arange_fn,
    "vqa": vqa_satisfaction,
    "llava_vqa": llava_vqa_satisfaction,
    "llava_bertscore": llava_bertscore,
}
