"""Loss registry (reference: ``openpoints/loss/build.py``, 962 LoC torch).

All losses are stateless callables over channels-last arrays:
``logits (B, N, C)``, ``labels (B, N)`` int — the reference uses (B, C, N).
Each class carries the same cfg surface (NAME + kwargs) so YAML
``criterion_args`` build unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core.registry import Registry

LOSS = Registry("loss")


def _flatten_logits(logits, labels):
    C = logits.shape[-1]
    return logits.reshape(-1, C), labels.reshape(-1)


@LOSS.register_module(name="CrossEntropy")
@LOSS.register_module(name="CrossEntropyLoss")
class CrossEntropy:
    def __init__(self, label_smoothing: float = 0.0, **kwargs):
        self.label_smoothing = label_smoothing

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        if self.label_smoothing > 0:
            C = logits.shape[-1]
            onehot = jax.nn.one_hot(labels, C)
            smooth = onehot * (1 - self.label_smoothing) + \
                (1 - onehot) * self.label_smoothing / (C - 1)
            loss = -jnp.sum(smooth * jax.nn.log_softmax(logits, -1), -1)
        return jnp.mean(loss)


@LOSS.register_module(name="SmoothCrossEntropy")
class SmoothCrossEntropy:
    """Reference ``build.py:16-67``."""

    def __init__(self, label_smoothing: float = 0.2, ignore_index=None,
                 num_classes=None, weight=None, **kwargs):
        self.label_smoothing = label_smoothing
        self.ignore_index = ignore_index
        self.weight = None if weight is None else jnp.asarray(weight).reshape(-1)

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        C = logits.shape[-1]
        valid = jnp.ones_like(labels, dtype=logits.dtype)
        if self.ignore_index is not None:
            valid = (labels != self.ignore_index).astype(logits.dtype)
            labels = jnp.where(labels == self.ignore_index, 0, labels)
        onehot = jax.nn.one_hot(labels, C)
        if self.label_smoothing > 0:
            onehot = onehot * (1 - self.label_smoothing) + \
                (1 - onehot) * self.label_smoothing / (C - 1)
        logp = jax.nn.log_softmax(logits, -1)
        if self.weight is not None:
            per = -jnp.sum(onehot * logp * self.weight, -1)
        else:
            per = -jnp.sum(onehot * logp, -1)
        return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)


@LOSS.register_module(name="MaskedCrossEntropy")
class MaskedCrossEntropy:
    """Reference ``build.py:71-83`` — CE restricted to mask==1 points."""

    def __init__(self, label_smoothing: float = 0.2, **kwargs):
        self.inner = CrossEntropy(label_smoothing)

    def __call__(self, logits, labels, mask):
        logits, labels = _flatten_logits(logits, labels)
        mask = mask.reshape(-1).astype(logits.dtype)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@LOSS.register_module(name="BCELogits")
class BCELogits:
    """Reference ``build.py:85-96``.

    Also registered as ``BCEWithLogitsLoss`` — the reference registers the
    torch class under that name too (``openpoints/loss/build.py:13``), so
    reference YAMLs with ``criterion_args: {NAME: BCEWithLogitsLoss}`` must
    build here as well.
    """

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, onehot))


LOSS.register_module(name="BCEWithLogitsLoss", module=BCELogits)


@LOSS.register_module(name="FocalLoss")
class FocalLoss:
    """Softmax focal loss (reference ``build.py:99-133``)."""

    def __init__(self, gamma: float = 0.0, alpha=None, size_average: bool = True,
                 **kwargs):
        self.gamma = gamma
        if isinstance(alpha, (int, float)):
            alpha = [alpha, 1 - alpha]
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self.size_average = size_average

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        logpt = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                    labels[:, None], axis=1)[:, 0]
        pt = jnp.exp(jax.lax.stop_gradient(logpt))
        if self.alpha is not None:
            logpt = logpt * self.alpha[labels]
        loss = -((1 - pt) ** self.gamma) * logpt
        return jnp.mean(loss) if self.size_average else jnp.sum(loss)


@LOSS.register_module(name="Poly1CrossEntropyLoss")
class Poly1CrossEntropy:
    """Reference ``build.py:136-180``: CE + eps * (1 - pt)."""

    def __init__(self, num_classes: int = 50, epsilon: float = 1.0,
                 reduction: str = "mean", weight=None, **kwargs):
        self.epsilon = epsilon
        self.reduction = reduction
        self.weight = None if weight is None else jnp.asarray(weight)

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        C = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, C)
        pt = jnp.sum(onehot * jax.nn.softmax(logits, -1), -1)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        if self.weight is not None:
            ce = ce * self.weight[labels]
        poly1 = ce + self.epsilon * (1 - pt)
        if self.reduction == "mean":
            return jnp.mean(poly1)
        if self.reduction == "sum":
            return jnp.sum(poly1)
        return poly1


def _poly1_focal_elem(logits, labels, epsilon, alpha, gamma):
    """Shared per-element sigmoid poly1-focal term
    (reference ``build.py:183-258``): returns (B, N, C) losses.
    logits (B, N, C); labels (B, N) int."""
    C = logits.shape[-1]
    p = jax.nn.sigmoid(logits)
    onehot = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    ce = optax.sigmoid_binary_cross_entropy(logits, onehot)
    pt = onehot * p + (1 - onehot) * (1 - p)
    fl = ce * ((1 - pt) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
        fl = alpha_t * fl
    return fl + epsilon * jnp.power(1 - pt, gamma + 1)


@LOSS.register_module(name="Poly1FocalLoss")
class Poly1FocalLoss:
    """Sigmoid focal + poly1 (reference ``build.py:183-258``) — the GeoT
    supervised criterion (``cfgs/tooth_semi/*.yaml: criterion_args``)."""

    def __init__(self, epsilon: float = 1.0, alpha: float = 0.25,
                 gamma: float = 2.0, reduction: str = "mean", **kwargs):
        self.epsilon, self.alpha, self.gamma = epsilon, alpha, gamma
        self.reduction = reduction

    def __call__(self, logits, labels):
        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)
        if self.reduction == "mean":
            return jnp.mean(poly1)
        if self.reduction == "sum":
            return jnp.sum(poly1)
        return poly1


class _Poly1FocalMasked:
    """Shared unsupervised wrapper: confidence-threshold mask + masked mean
    (reference ``Poly1FocalLoss_U``/``_U_corr``, ``build.py:261-354,799-892`` —
    both have identical forward; _U_corr is fed T-corrected logits by the
    caller)."""

    def __init__(self, epsilon: float = 1.0, alpha: float = 0.25,
                 gamma: float = 2.0, **kwargs):
        self.epsilon, self.alpha, self.gamma = epsilon, alpha, gamma

    def __call__(self, logits, labels, logits_pred, thresh: float = 0.95,
                 mask: Optional[jnp.ndarray] = None):
        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)                    # (B, N, C)
        if mask is None:
            mask = (logits_pred >= thresh)
        mask = mask[..., None].astype(poly1.dtype)               # (B, N, 1)
        return jnp.sum(poly1 * mask) / (jnp.sum(mask) * poly1.shape[-1] + 0.001)


@LOSS.register_module(name="Poly1FocalLoss_U")
class Poly1FocalLossU(_Poly1FocalMasked):
    pass


@LOSS.register_module(name="Poly1FocalLoss_U_corr")
class Poly1FocalLossUCorr(_Poly1FocalMasked):
    pass


@LOSS.register_module(name="Poly1FocalLoss_U_T")
class Poly1FocalLossUT(_Poly1FocalMasked):
    """Adds the importance reweight beta = p_before_T / p_after_T at the
    pseudo-label class (reference ``build.py:564-688``)."""

    def __call__(self, logits, labels, logits_pred, T, pred_u_t,
                 thresh: float = 0.95, mask: Optional[jnp.ndarray] = None):
        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)                    # (B, N, C)
        after = jnp.take_along_axis(pred_u_t, labels[..., None], axis=-1)[..., 0]
        beta = logits_pred / after                                # (B, N)
        poly1 = poly1 * beta[..., None]
        if mask is None:
            mask = (logits_pred >= thresh)
        mask = mask[..., None].astype(poly1.dtype)
        return jnp.sum(poly1 * mask) / (jnp.sum(mask) * poly1.shape[-1] + 0.001)


@LOSS.register_module(name="Poly1FocalLoss_U_Cur")
class Poly1FocalLossUCur(_Poly1FocalMasked):
    """Masked by an external curriculum/curvature score instead of the
    teacher confidence (reference ``build.py:357-442``)."""

    def __call__(self, logits, labels, logits_pred, thresh: float = 0.95,
                 cur=None):
        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)
        mask = ((cur if cur is not None else logits_pred) >= thresh)
        mask = mask[..., None].astype(poly1.dtype)
        return jnp.sum(poly1 * mask) / (jnp.sum(mask) * poly1.shape[-1] + 0.001)


@LOSS.register_module(name="Poly1FocalLoss_U_top2")
class Poly1FocalLossUTop2(_Poly1FocalMasked):
    """Extends the threshold mask with ambiguous-but-consistent points: where
    top1+top2 prob >= 0.9 and the point's top-2 labels are swapped with its
    spatial nearest neighbour's (reference ``build.py:445-560``).
    Returns (loss, thresh_mask, topk_mask)."""

    def __call__(self, logits, labels, logits_pred, pred_u, pos,
                 thresh: float = 0.95, mask=None):
        from ..ops import knn as _knn

        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)
        thresh_mask = mask if mask is not None else (logits_pred >= thresh)
        top2_vals, top2_lab = jax.lax.top_k(jax.lax.stop_gradient(pred_u), 2)
        top2_mask = ((top2_vals[..., 0] + top2_vals[..., 1]) >= 0.9) & (~thresh_mask)
        label1, label2 = top2_lab[..., 0], top2_lab[..., 1]
        _, nn_idx = _knn(pos, pos, 2)
        nn1 = nn_idx[..., 1]
        l1n = jnp.take_along_axis(label1, nn1, axis=1)
        l2n = jnp.take_along_axis(label2, nn1, axis=1)
        topk_mask = (label1 == l2n) & (label2 == l1n) & top2_mask
        full = (thresh_mask | topk_mask)[..., None].astype(poly1.dtype)
        loss = jnp.sum(poly1 * full) / (jnp.sum(full) * poly1.shape[-1] + 0.001)
        return loss, thresh_mask | topk_mask, topk_mask


@LOSS.register_module(name="Poly1FocalLoss_U_T_v1")
class Poly1FocalLossUTV1(_Poly1FocalMasked):
    """_U_T variant computing the after-T confidence internally from the
    (T + delta_T)-corrected weak probabilities (reference ``build.py:691-795``,
    positional order ``(logits, labels, logits_pred, T, pred_u, delta_T)`` as
    in the reference forward). Returns (loss, delta_T)."""

    def __call__(self, logits, labels, logits_pred, T, pred_u, delta_T,
                 thresh: float = 0.95, mask=None):
        poly1 = _poly1_focal_elem(logits, labels, self.epsilon, self.alpha,
                                  self.gamma)
        ema_t_corr = T + delta_T
        corrected = jnp.einsum("bnc,cd->bnd", pred_u, ema_t_corr)
        after = jnp.take_along_axis(corrected, labels[..., None], axis=-1)[..., 0]
        beta = logits_pred / after
        poly1 = poly1 * beta[..., None]
        if mask is None:
            mask = (logits_pred >= thresh)
        maskf = mask[..., None].astype(poly1.dtype)
        loss = jnp.sum(poly1 * maskf) / (jnp.sum(maskf) * poly1.shape[-1] + 0.001)
        return loss, delta_T


@LOSS.register_module(name="Weight_CELoss")
class WeightCELoss:
    """Class-weighted NLL (reference ``build.py:913-926``): weights are the
    per-sample class histograms averaged over the batch."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, labels, class_weights):
        w = jnp.mean(class_weights, axis=0)                       # (C,)
        logits, labels = _flatten_logits(logits, labels)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0] * w[labels]
        return jnp.mean(nll)


@LOSS.register_module(name="Weight_CELoss_U")
class WeightCELossU:
    """Thresholded + background-excluded weighted CE
    (reference ``build.py:928-939``): points under threshold or with
    pseudo-label 0 are ignored."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, labels, class_weights, logits_pred,
                 thresh: float = 0.95):
        w = jnp.mean(class_weights, axis=0)
        keep = (logits_pred >= thresh) & (labels != 0)
        logits_f, labels_f = _flatten_logits(logits, labels)
        keep = keep.reshape(-1).astype(logits_f.dtype)
        logp = jax.nn.log_softmax(logits_f, -1)
        nll = -jnp.take_along_axis(logp, labels_f[:, None], 1)[:, 0] * w[labels_f]
        # reference uses reduction='none' then .mean() over ALL points with
        # ignore_index zeroing — i.e. mean over the kept subset
        return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


@LOSS.register_module(name="MSE_Loss_U")
class MSELossU:
    """Self-thresholded softmax MSE (reference ``build.py:941-953``)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, target, thresh: float = 0.95):
        probs = jax.nn.softmax(logits, -1)
        mask = (probs >= thresh).astype(probs.dtype)          # (B, N, C)
        loss = (probs - target) ** 2
        # bug-compatible with the reference (``build.py:952``):
        # ``loss * thresh_mask.unsqueeze(1)`` right-align-broadcasts
        # (1,B,C,N) x (B,1,C,N) -> (B,B,C,N), so per (c,n) the numerator is
        # (sum_b mask) * (sum_b' loss); verified vs the torch oracle
        num = jnp.sum(jnp.sum(mask, 0) * jnp.sum(loss, 0))
        return num / (jnp.sum(mask) + 0.001)


@LOSS.register_module(name="MultiShapeCrossEntropy")
class MultiShapeCrossEntropy:
    """Per-shape-category criterion dispatch (reference ``build.py:896-911``)."""

    def __init__(self, criterion_args, **kwargs):
        self.criterion = build_criterion_from_cfg(criterion_args)

    def __call__(self, logits_all_shapes, points_labels, shape_labels):
        # logits_all_shapes: (S, B, N, C) stacked per-shape logits
        B = shape_labels.shape[0]
        losses = 0.0
        for i in range(B):
            sl = shape_labels[i]
            logits = logits_all_shapes[sl][i][None]
            losses += self.criterion(logits, points_labels[i][None])
        return losses / B


@LOSS.register_module(name="LabelSmoothingCrossEntropy")
class LabelSmoothingCrossEntropy:
    """Reference ``openpoints/loss/cross_entropy.py:13``."""

    def __init__(self, smoothing: float = 0.1, **kwargs):
        self.smoothing = smoothing

    def __call__(self, logits, labels):
        logits, labels = _flatten_logits(logits, labels)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        smooth = -jnp.mean(logp, axis=-1)
        return jnp.mean((1 - self.smoothing) * nll + self.smoothing * smooth)


@LOSS.register_module(name="SoftTargetCrossEntropy")
class SoftTargetCrossEntropy:
    """Reference ``openpoints/loss/cross_entropy.py:31`` — targets are
    probability distributions."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, target):
        C = logits.shape[-1]
        logits = logits.reshape(-1, C)
        target = target.reshape(-1, C)
        return jnp.mean(jnp.sum(-target * jax.nn.log_softmax(logits, -1), -1))


@LOSS.register_module(name="DistillLoss")
class DistillLoss:
    """KD: CE on labels + KL(student || teacher) at temperature tau
    (reference ``openpoints/loss/distill_loss.py:14``)."""

    def __init__(self, alpha: float = 0.5, tau: float = 1.0, **kwargs):
        self.alpha = alpha
        self.tau = tau

    def __call__(self, student_logits, teacher_logits, labels):
        ce = CrossEntropy()(student_logits, labels)
        C = student_logits.shape[-1]
        s = jax.nn.log_softmax(student_logits.reshape(-1, C) / self.tau, -1)
        t = jax.nn.softmax(teacher_logits.reshape(-1, C) / self.tau, -1)
        kd = jnp.mean(jnp.sum(t * (jnp.log(t + 1e-12) - s), -1)) * self.tau ** 2
        return (1 - self.alpha) * ce + self.alpha * kd


def build_criterion_from_cfg(cfg, **default_args):
    """Reference ``build.py:955``."""
    return LOSS.build(cfg, **default_args)
