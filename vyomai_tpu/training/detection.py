"""DETR set-prediction loss: host-side Hungarian matching + jittable loss
given the assignment (the standard split — matching is data-dependent
control flow, the loss is dense math)."""

import jax
import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                           axis=-1)


def paired_giou(a, b):
    """Elementwise GIoU of matched pairs a [K,4], b [K,4] (xyxy) -> [K]
    (the O(K) row-wise form of :func:`generalized_iou`'s diagonal)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, :2], b[:, :2])
    rb = jnp.minimum(a[:, 2:], b[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-8)
    lt_hull = jnp.minimum(a[:, :2], b[:, :2])
    rb_hull = jnp.maximum(a[:, 2:], b[:, 2:])
    wh_hull = jnp.clip(rb_hull - lt_hull, 0)
    hull = wh_hull[:, 0] * wh_hull[:, 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-8)


def generalized_iou(a, b):
    """GIoU between box sets a [N,4], b [M,4] (xyxy). Returns [N, M]."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-8)
    lt_hull = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb_hull = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh_hull = jnp.clip(rb_hull - lt_hull, 0)
    hull = wh_hull[..., 0] * wh_hull[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-8)


def hungarian_match(class_logits, boxes, gt_labels, gt_boxes,
                    *, cost_class=1.0, cost_bbox=5.0, cost_giou=2.0):
    """Host-side bipartite matching for ONE image.

    class_logits [Q, C+1], boxes [Q, 4] cxcywh; gt_labels [M], gt_boxes
    [M, 4] cxcywh. Returns (query_idx, gt_idx) numpy arrays."""
    from scipy.optimize import linear_sum_assignment
    probs = np.asarray(jax.nn.softmax(class_logits, -1))
    b = np.asarray(boxes)
    g = np.asarray(gt_boxes)
    if len(g) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    c_class = -probs[:, np.asarray(gt_labels)]               # [Q, M]
    c_bbox = np.abs(b[:, None] - g[None]).sum(-1)
    giou = np.asarray(generalized_iou(
        box_cxcywh_to_xyxy(jnp.asarray(b)),
        box_cxcywh_to_xyxy(jnp.asarray(g))))
    cost = cost_class * c_class + cost_bbox * c_bbox - cost_giou * giou
    qi, gi = linear_sum_assignment(cost)
    return qi.astype(np.int64), gi.astype(np.int64)


def detr_loss_single(class_logits, boxes, gt_labels, gt_boxes, match,
                     *, num_classes: int, no_object_weight: float = 0.1,
                     w_class=1.0, w_bbox=5.0, w_giou=2.0):
    """Jittable loss for one image given the matching (qi, gi)."""
    qi, gi = match
    q = class_logits.shape[0]
    # classification target: no-object (= num_classes) everywhere, matched
    # queries get their gt label
    target = jnp.full((q,), num_classes, dtype=jnp.int32)
    target = target.at[qi].set(jnp.asarray(gt_labels)[gi].astype(jnp.int32))
    weights = jnp.full((q,), no_object_weight)
    weights = weights.at[qi].set(1.0)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    loss_class = jnp.sum(ce * weights) / jnp.maximum(weights.sum(), 1.0)

    if len(qi) == 0:
        return w_class * loss_class
    pb = boxes[qi]
    gb = jnp.asarray(gt_boxes)[gi]
    loss_bbox = jnp.abs(pb - gb).sum(-1).mean()
    giou = paired_giou(box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(gb))
    loss_giou = (1.0 - giou).mean()
    return w_class * loss_class + w_bbox * loss_bbox + w_giou * loss_giou


def detr_loss(class_logits, boxes, targets, *, num_classes: int):
    """Batch loss: match on host per image, average the jittable losses.

    targets: list of (gt_labels [M_i], gt_boxes [M_i, 4])."""
    if not targets:   # empty batch tail: no images, no loss
        return jnp.float32(0.0)
    total = 0.0
    for i, (gt_labels, gt_boxes) in enumerate(targets):
        match = hungarian_match(class_logits[i], boxes[i], gt_labels,
                                gt_boxes)
        total = total + detr_loss_single(class_logits[i], boxes[i],
                                         gt_labels, gt_boxes, match,
                                         num_classes=num_classes)
    return total / len(targets)
