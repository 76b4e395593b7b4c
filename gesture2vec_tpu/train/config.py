"""YAML configuration with the reference's flag surface.

Drop-in compatible with the reference's configargparse setup
(ref: config/parse_args.py:16-96): the same YAML files load unmodified.
Differences by design:
  - string booleans ("True"/"False") are normalized to real bools
    (the reference compares `== 'True'` all over the codebase);
  - unknown keys are kept (forward compatible) but access to undeclared
    attributes raises, so typos fail fast;
  - data_mean/data_std become numpy arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np
import yaml

_BOOL_STRINGS = {"true": True, "yes": True, "t": True, "y": True, "1": True,
                 "false": False, "no": False, "f": False, "n": False,
                 "0": False}

# flags that the reference declares as string booleans
# (ref: config/parse_args.py:44-63,79-82)
_BOOL_FLAGS = {
    "sentence_level", "autoencoder_denoising", "autoencoder_att",
    "autoencoder_fixed_weight", "autoencoder_conditioned", "use_derivative",
    "autoencoder_vae", "autoencoder_freeze_encoder", "autoencoder_vq",
    "text2_embedding_discrete", "use_similarity", "Modality_Audio",
    "Modality_Text", "Modality_Gesture", "eval_dropout_quirk",
    "save_optimizer", "keep_best",
}


@dataclasses.dataclass
class Config:
    """Typed view over a reference-style YAML config."""

    # identity / paths (ref: parse_args.py:18-25)
    name: str = "main"
    train_data_path: Optional[str] = None
    val_data_path: Optional[str] = None
    test_data_path: Optional[str] = None
    model_save_path: str = "output"
    random_seed: int = -1

    # word embedding (ref: parse_args.py:28-31)
    wordembed_path: Optional[str] = None
    wordembed_dim: int = 300
    sentence_level: bool = False
    sentence_frame_length: int = 120

    # model (ref: parse_args.py:34-40)
    model: str = "DAE"
    epochs: int = 10
    batch_size: int = 50
    dropout_prob: float = 0.3
    n_layers: int = 2
    hidden_size: int = 200

    # autoencoder (ref: parse_args.py:43-55)
    autoencoder_denoising: bool = True
    autoencoder_att: bool = False
    autoencoder_fixed_weight: bool = False
    autoencoder_conditioned: bool = True
    use_derivative: bool = False
    autoencoder_checkpoint: Optional[str] = None
    autoencoder_vae: bool = False
    autoencoder_freeze_encoder: bool = False
    autoencoder_vq: bool = False
    autoencoder_vq_components: int = 512
    autoencoder_vq_commitment_cost: float = 0.25

    # text2embedding / similarity (ref: parse_args.py:58-65)
    text2_embedding_discrete: bool = False
    use_similarity: bool = False
    similarity_labels: Optional[str] = None
    data_for_sim: Optional[str] = None
    loss_label_weight: float = 0.0

    # dataset (ref: parse_args.py:67-77)
    data_mean: Optional[np.ndarray] = None
    data_std: Optional[np.ndarray] = None
    motion_resampling_framerate: int = 24
    n_poses: int = 50
    n_pre_poses: int = 5
    subdivision_stride: int = 5
    subdivision_stride_sentence: int = 30
    loader_workers: int = 4
    input_motion_dim: int = 135

    # modalities (ref: parse_args.py:80-82)
    Modality_Audio: bool = False
    Modality_Text: bool = False
    Modality_Gesture: bool = True

    # training (ref: parse_args.py:85-89)
    learning_rate: float = 0.001
    loss_l1_weight: float = 50.0
    loss_cont_weight: float = 0.1
    loss_var_weight: float = 0.01

    # representation learning (ref: parse_args.py:92-94)
    rep_learning_checkpoint: Optional[str] = None
    rep_learning_dim: int = -1

    # GAN (ref: parse_args.py:97)
    noise_dim: int = 200
    gan_keep_unrolled: bool = False  # parity switch: the reference's
    # unrolled-D "restore" is a no-op (state_dict() aliases the live
    # tensors, train_seq2seq.py:610,645), so the reference actually
    # KEEPS all 10 unrolled D updates (~11 D steps/iter). False = the
    # repaired unrolled-GAN semantics (restore D, Metz et al.); True =
    # reproduce the reference's literal behavior.

    # TPU-native additions (not in the reference)
    mesh_shape: Optional[Dict[str, int]] = None   # e.g. {"dp": 8}
    compute_dtype: str = "float32"                # or "bfloat16"
    scan_unroll: int = 1   # GRU/decoder scan unroll: identical numerics,
    # within noise on the tunnel-attached chip (benchmarks/README.md);
    # a tuning surface for direct-attached hardware
    save_optimizer: bool = True  # store optax state + PRNG key in
    # checkpoints so resume_from continues bit-exactly (the reference
    # never saves optimizer state, ref: utils/train_utils.py:98-113)
    autoencoder_vq_variant: str = "gssoft"  # "gssoft" (reference
    # parity) | "rvq" (residual VQ: tighter reconstruction at the same
    # token granularity; stage 0 stays THE gesture token)
    rvq_stages: int = 2
    rvq_reestimate_every: int = 10  # epochs between K-Means re-fits of
    # the residual-VQ stage codebooks (0 disables). Gradient-trained
    # hard-assign codebooks collapse at corpus scale — dead codes never
    # receive gradient (measured: 2/64 codes used without this,
    # benchmarks/quality_vq_ablation.py); the periodic per-stage re-fit
    # mirrors the Part-a codebook trick (ref: train_DAE.py:241-263)
    token_stages: int = 1  # Part d: >1 adds residual-stage token heads
    # (one per RVQ stage) so decode-mode inference can rebuild the full
    # multi-stage quantized hidden instead of stage 0 only; requires a
    # vq_variant="rvq" Part-b teacher. 1 = reference behavior.
    stage_conditional: bool = False  # Part d, token_stages > 1: chain
    # the residual-stage heads — head s predicts stage s+1's code from
    # the decoder state PLUS embeddings of the stage <= s codes
    # (teacher-forced at train, chained through the chosen codes at
    # decode), instead of S independent heads off the same state.
    # Motivation: independent summed-CE heads must marginalize over the
    # earlier stages' choices (4-stage val CE blew up 21.6 vs 8.3,
    # QUALITY.md), while the residual structure is conditional by
    # construction. False = the round-3 independent-head behavior.
    text_context_s: float = 0.0  # Part d (beyond reference): extend
    # each sentence window's WORD lookup backwards by this many seconds
    # (dataset build AND inference) — motion at a window's start can
    # depend on a word spoken just before it (crossfades straddle
    # window boundaries), which the reference's window-local lookup
    # misses. 0.0 = reference behavior.
    label_smoothing: float = 0.0  # Part-d/audio token CE label smoothing
    # (training only; eval CE stays plain so reported numbers compare).
    # 0.0 = reference parity — the reference trains plain CE
    # (train_seq2seq.py:499-530)
    keep_best: bool = False  # token trainers: also track/checkpoint the
    # best-val-loss epoch and return that state instead of the final
    # epoch's (early-stopping selection; the reference keeps only
    # fixed-cadence checkpoints and its Part d overfits past ~1/3 of its
    # schedule — QUALITY.md). False = reference behavior.
    feedback_finetune_epochs: int = 0  # Part d (beyond reference): train
    # the LAST N epochs on the model's own decode-time feedback rollout
    # (argmax/sampled tokens feed back after n_pre_poses, the stage
    # chain conditions on its own choices) instead of the parallel
    # teacher-forced pass. Motivation: the transformer variant trains
    # fully teacher-forced (models/transformer.py) while the reference
    # GRU trains on its own argmax feedback
    # (ref text2embedding_model.py:734-744) and the recommended recipe
    # is EVALUATED free-running — this closes the train/inference
    # feedback mismatch for the last N epochs. 0 = off (reference
    # behavior for the GRU, which already feeds back argmax).
    feedback_temperature: float = 0.0  # feedback policy for the
    # finetune phase: 0 = argmax feedback (the reference's train-time
    # semantics), > 0 = sampled feedback at this temperature (matches
    # the sampled-decode inference policy the recipe ships with).
    eval_dropout_quirk: bool = True  # reproduce the reference's eval-time
    # 0.95 decoder dropout (ref: Autoencoder_VQVAE_model.py:570)
    audio_fusion: str = "audio"  # audio2token encoder: "audio" (the
    # shipped Audio_Features=True branch) | "both" (the text+audio
    # fusion branch, ref Helper_models.py both=True - repaired, see
    # models/audio.AudioTextFusionEncoder)

    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        for k in ("data_mean", "data_std"):
            if d[k] is not None:
                d[k] = np.asarray(d[k]).tolist()
        return d


def _coerce(key: str, value: Any) -> Any:
    if key in _BOOL_FLAGS and isinstance(value, str):
        return _BOOL_STRINGS[value.strip().lower()]
    if key in ("data_mean", "data_std") and value is not None:
        return np.asarray(value, dtype=np.float32)
    if key == "autoencoder_vq_components":
        return int(value)
    if key == "autoencoder_vq_commitment_cost":
        return float(value)
    return value


def load_config(path_or_dict, **overrides) -> Config:
    """Load a reference-style YAML file (or dict) into a Config."""
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f) or {}
    raw.update(overrides)

    field_names = {f.name for f in dataclasses.fields(Config)}
    kwargs: Dict[str, Any] = {}
    extras: Dict[str, Any] = {}
    for k, v in raw.items():
        v = _coerce(k, v)
        if k in field_names:
            kwargs[k] = v
        else:
            extras[k] = v
    cfg = Config(**kwargs)
    cfg.extras.update(extras)
    return cfg
