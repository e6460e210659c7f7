"""Pallas TPU kernels (see /opt guide conventions): VMEM-resident stages of
the detector hot path."""

from chalkydri_tpu.ops.pallas.ccl_kernel import (  # noqa: F401
    label_components_pallas,
    threshold_ccl_pallas,
)
