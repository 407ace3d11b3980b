import jax.numpy as jnp
import numpy as np

from pointseg.train import metrics as M


def _make_batch(rng, B=3, N=20, C=5, lengths=(20, 7, 0)):
    probs = rng.random(size=(B, N, C)).astype(np.float32)
    labels_int = rng.integers(0, C, size=(B, N))
    onehot = np.eye(C, dtype=np.uint8)[labels_int]
    lengths = np.array(lengths)
    for b in range(B):
        onehot[b, lengths[b]:] = 0
        probs[b, lengths[b]:] = 0
    return probs, onehot, lengths


def _np_loops(probs, onehot, lengths):
    """Numpy transcription of the reference's per-element loops
    (Training/metrics.py)."""
    B, N, C = onehot.shape
    correct = 0
    matrix = np.zeros((C, C), dtype=np.int64)
    inter = np.zeros(C)
    union = np.zeros(C)
    for b in range(B):
        L = lengths[b]
        pred = probs[b, :L].argmax(-1)
        lab = onehot[b, :L].argmax(-1)
        correct += int((pred == lab).sum())
        for i in range(C):
            p_i = pred[lab == i]
            for j in range(C):
                matrix[i, j] += int((p_i == j).sum())
        for c in range(C):
            lm = onehot[b, :L, c] == 1
            pm = pred == c
            inter[c] += int(np.logical_and(lm, pm).sum())
            union[c] += int(np.logical_or(lm, pm).sum())
    total = int(lengths.sum())
    return correct, total, matrix, inter, union


def test_accuracy_matches_reference_loops(rng):
    probs, onehot, lengths = _make_batch(rng)
    c_ref, t_ref, _, _, _ = _np_loops(probs, onehot, lengths)
    c, t = M.update_accuracy(jnp.array(probs), jnp.array(onehot), jnp.array(lengths))
    assert int(c) == c_ref and int(t) == t_ref
    oa = M.overall_accuracy(jnp.array(probs), jnp.array(onehot), jnp.array(lengths))
    assert abs(float(oa) - c_ref / t_ref) < 1e-6


def test_confusion_matrix_matches_reference_loops(rng):
    probs, onehot, lengths = _make_batch(rng)
    _, _, m_ref, _, _ = _np_loops(probs, onehot, lengths)
    m = M.confusion_matrix(jnp.array(probs), jnp.array(onehot), jnp.array(lengths))
    np.testing.assert_array_equal(np.asarray(m), m_ref)


def test_iou_matches_reference_loops(rng):
    probs, onehot, lengths = _make_batch(rng)
    _, _, _, i_ref, u_ref = _np_loops(probs, onehot, lengths)
    inter, union = M.update_intersection_over_union(
        jnp.array(probs), jnp.array(onehot), jnp.array(lengths)
    )
    np.testing.assert_allclose(np.asarray(inter), i_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), u_ref, atol=1e-5)

    miou, ious = M.intersection_over_union(
        jnp.array(probs), jnp.array(onehot), jnp.array(lengths)
    )
    eps = 1e-6
    ious_ref = (i_ref + eps) / (u_ref + eps)
    np.testing.assert_allclose(np.asarray(ious), ious_ref, rtol=1e-5)
    assert abs(float(miou) - ious_ref.mean()) < 1e-5


def test_absent_class_gets_iou_one():
    # one sample, all points class 0, predicted class 0 -> class 1 IoU = 1 via eps
    probs = np.zeros((1, 4, 3), np.float32)
    probs[..., 0] = 1
    onehot = np.zeros((1, 4, 3), np.uint8)
    onehot[..., 0] = 1
    _, ious = M.intersection_over_union(
        jnp.array(probs), jnp.array(onehot), jnp.array([4])
    )
    assert float(ious[1]) == 1.0 and float(ious[0]) == 1.0


def test_hand_computed_confusion():
    # 2 points: true 0 pred 1, true 1 pred 1
    probs = np.array([[[0.1, 0.9], [0.2, 0.8]]], np.float32)
    onehot = np.array([[[1, 0], [0, 1]]], np.uint8)
    m = M.confusion_matrix(jnp.array(probs), jnp.array(onehot), jnp.array([2]))
    np.testing.assert_array_equal(np.asarray(m), [[0, 1], [0, 1]])


def test_legacy_accuracy_includes_padding():
    labels = jnp.array([[[1, 0], [1, 0]]], jnp.float32)  # both argmax 0
    preds = jnp.array([[[0.9, 0.1], [0.2, 0.8]]], jnp.float32)
    acc = M.accuracy_from_one_hot(labels, preds)
    assert abs(float(acc) - 0.5) < 1e-6
