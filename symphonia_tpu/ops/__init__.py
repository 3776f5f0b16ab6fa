"""symphonia_tpu.ops — TPU compute kernels and vectorized host primitives.

Each module pairs a numpy host implementation (the oracle, also used for
small scalar decode paths) with a jax/Pallas device implementation used by
the batched decode pipeline. Kernel modules:

* ``bitpack`` — packed-bitstream primitives: batched bit-window extraction,
  vectorized unary/Rice decode, LUT codebook decode (the TPU-first
  re-expression of symphonia-core/src/io/bit.rs).
* ``pcm`` — PCM byte -> sample conversion kernels.
* ``mdct`` — IMDCT-as-matmul (MP3 36/12-pt, AAC 2048/256-pt, Vorbis lapped).
* ``synthesis`` — MP3 32-band polyphase synthesis (DCT-32 + windowed FIR as
  MXU matmuls).
* ``lpc`` — FLAC/ALAC integer LPC reconstruction scan kernels.
"""
