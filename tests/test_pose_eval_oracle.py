"""Golden tests for the vertex-regressed pose evaluation protocol
against the reference's own metric machinery
(core/utils/evaluation_helpers.py:387-612).

The reference's full evaluate_pampjpe_from_smpl_params needs the SMPL
body-model .pkl (absent here); everything downstream of the body model
— vertices2joints regression, SPIN_TO_CANON reorder, per-frame
Procrustes correction, pelvis-centered MPJPE — is its own importable
code and is used as the oracle on synthetic vertices.
"""
import numpy as np
import torch

import ref_oracle
from anerf_tpu.eval.metrics import (SPIN_TO_CANON, CANON_PELVIS,
                                    h36m_joints_from_vertices,
                                    pose_metrics_from_smpl_params,
                                    vertices2joints)

T = torch.from_numpy


def _synthetic(seed=0, n=5, v=40):
    rng = np.random.RandomState(seed)
    verts = rng.normal(scale=0.3, size=(n, v, 3)).astype(np.float32)
    reg = rng.uniform(0, 1, size=(17, v)).astype(np.float32)
    reg /= reg.sum(-1, keepdims=True)
    return verts, reg


def test_vertices2joints_matches_smplx_formula():
    """Our regression == smplx.lbs.vertices2joints
    (einsum('bik,ji->bjk', verts, J)), which the reference's
    SMPLEvalHelper calls (evaluation_helpers.py:535-537)."""
    verts, reg = _synthetic()
    ours = vertices2joints(reg, verts)
    smplx_formula = torch.einsum('bik,ji->bjk', T(verts), T(reg)).numpy()
    np.testing.assert_allclose(ours, smplx_formula, atol=1e-6)


def test_pa_mpjpe_protocol_vs_reference_criteria():
    """PA-MPJPE/MPJPE of the vertex-regressed path match the reference's
    Criterion3DPose_ProcrustesCorrected + pelvis-centered
    Criterion_MPJPE run on the same regressed joints
    (evaluation_helpers.py:464-505,566-590)."""
    ref_oracle.load_reference()
    ref_eval = __import__('core.utils.evaluation_helpers',
                          fromlist=['x'])
    verts, reg = _synthetic(seed=3)
    pred = h36m_joints_from_vertices(verts, reg).astype(np.float32)
    rng = np.random.RandomState(7)
    gt = (pred + rng.normal(scale=0.03, size=pred.shape)
          ).astype(np.float32)

    ours = pose_metrics_from_smpl_params(gt, vertices=verts,
                                         j_regressor=reg,
                                         scale_to_mm=1000.)

    # reference PA-MPJPE: per-frame procrustes correction then MPJPE
    crit = ref_eval.Criterion_MPJPE(reduction='none')
    pa_crit = ref_eval.Criterion3DPose_ProcrustesCorrected(crit)
    pa_dists, _ = pa_crit(T(pred), T(gt))
    ref_pa = float(pa_dists.mean()) * 1000.
    np.testing.assert_allclose(ours['pa_mpjpe'], ref_pa, rtol=1e-4)

    # reference MPJPE: center both at canonical pelvis (joint 14)
    pred_c = pred - pred[:, CANON_PELVIS:CANON_PELVIS + 1]
    gt_c = gt - gt[:, CANON_PELVIS:CANON_PELVIS + 1]
    ref_mpjpe = float(ref_eval.Criterion_MPJPE(reduction='mean')(
        T(pred_c), T(gt_c))) * 1000.
    np.testing.assert_allclose(ours['mpjpe'], ref_mpjpe, rtol=1e-4)

    # PCK/AUC over the PA-corrected per-joint distances
    d = pa_dists.numpy().reshape(-1) * 1000.
    np.testing.assert_allclose(ours['pck@150'], float((d < 150).mean()),
                               atol=1e-6)
    ths = np.linspace(0., 150., 31)
    np.testing.assert_allclose(
        ours['auc'], float(np.mean([(d < t).mean() for t in ths])),
        atol=1e-3)


def test_canon_reorder_matches_reference_constant():
    ref_oracle.load_reference()
    ref_eval = __import__('core.utils.evaluation_helpers',
                          fromlist=['x'])
    assert SPIN_TO_CANON == ref_eval.SPIN_TO_CANON
