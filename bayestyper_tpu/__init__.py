"""bayestyper_tpu — a TPU-native (JAX/XLA/Pallas) genotyping engine with the
capabilities of BayesTyper: SNV/indel/SV genotyping from read k-mer counts.

See SURVEY.md for the structural analysis of the reference implementation and
README.md for the design overview.
"""

__version__ = "0.1.0"
