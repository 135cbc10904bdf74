"""relation_tpu: a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the full
capability surface of msracver/Relation-Networks-for-Object-Detection.

The reference is an MXNet v1.1.0 Faster R-CNN framework (ResNet-101 + RPN + 2FC head)
extended with the Object Relation Module (16-head geometry-biased attention between ROI
features) and a learned-NMS duplicate-removal head, plus Deformable-ConvNet and FPN
variants.  This package rebuilds every layer of that stack TPU-first:

- ``ops``       static-shape, jit-compatible numeric detection core (boxes, anchors,
                on-device NMS, sinusoidal embeddings, ROI pooling, deformable ops)
                plus Pallas TPU kernels for the hot paths.
- ``models``    ResNet-101 frozen-BN backbone (NHWC), RPN, relation attention head,
                learned-NMS head, DCN and FPN variants — assembled into detectors.
- ``core``      pjit data-parallel trainer, predictor/evaluator, checkpointing.
- ``data``      COCO roidb + host image pipeline + prefetching loader.
- ``parallel``  device-mesh / sharding utilities.
- ``config``    config tree + YAML overlay, schema-compatible with the reference's
                ``experiments/relation_rcnn/cfgs/*.yaml``.

Reference citations in docstrings use ``path:line`` into the upstream repository.
"""

__version__ = "0.1.0"
