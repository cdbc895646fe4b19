"""rsem_tpu: a TPU-native transcript-quantification framework.

A from-scratch reimplementation of the capabilities of RSEM (deweylab/RSEM)
designed for TPU hardware: the alignment likelihood matrix lives on device as a
padded CSR, the EM E-step is a fused segment-softmax, model re-estimation is a
set of weighted-histogram scatter-adds, and posterior inference (collapsed
Gibbs, Gamma-resampled credibility intervals) runs as vectorized on-device
samplers.  Multi-chip scaling is data-parallel over reads with psum-merged
sufficient statistics.

Subpackages
-----------
refprep   reference preparation (GTF/transcript FASTA -> reference artifacts)
io        alignment ingestion (SAM/BAM -> device hit tensors), results writers
model     generative read model primitives (length dists, RSPD, error profiles)
engine    inference engines: EM, Gibbs, credibility intervals, simulator
ops       TPU kernels (segment softmax/sum, Pallas E-step)
parallel  mesh / sharding helpers
pipeline  user-facing drivers (prepare-reference, calculate-expression, ...)
"""

__version__ = "0.1.0"
