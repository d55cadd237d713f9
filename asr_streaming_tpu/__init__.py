"""TPU-native streaming speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
streaming-ASR stack (Naiscorp-Robotics/ASR-streaming): streaming Emformer
CTC acoustic model, device-side VAD gating and greedy decoding, online
endpointing, lexicon + n-gram beam-search rescoring with word alignments,
and a continuous-batching websocket serving layer that packs hundreds of
concurrent real-time streams into fixed-shape batched TPU steps.
"""

__version__ = "0.1.0"
