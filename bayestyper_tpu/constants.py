"""Global constants of the TPU-native BayesTyper-capability genotyping engine.

Values mirror the reference defaults so outputs are comparable
(reference: main.cpp:125-137, 389-403; Utils.hpp:57-77;
CountDistribution.cpp:43-48; Filters.cpp:33).
"""

# k-mer size (reference: BT_KMER_SIZE compile flag, CMakeLists.txt:12-22; k=55 for
# the published pipeline, KMC run with -k55).
KMER_SIZE = 55

# uint8 saturation ceilings (reference: Utils.hpp uchar_overflow / bit7_overflow).
MAX_KMER_COUNT = 255          # observed k-mer counts saturate here
MAX_KMER_MULTIPLICITY = 255   # diplotype multiplicity ceiling in the PMF cache
MAX_HAPLOID_MULTIPLICITY = 127  # per-haplotype path multiplicity cap (VariantClusterGraph.cpp:911-925)

# Negative-binomial parameter estimation (CountDistribution.cpp:43-44).
MAX_NB_KMER_MULTIPLICITY = 32
MIN_NB_KMER_COUNT = 10000
NB_MAX_P = 0.99               # variance floor p <= 0.99 (NegativeBinomialDistribution.cpp:38)

# Number of GC-bias bins for the genomic rate (always 1 in reference v1.5,
# CountDistribution.cpp:46).
NUM_GC_BIAS_BINS = 1

# Gibbs sampling defaults (main.cpp:389-395).
GIBBS_BURN_IN = 100
GIBBS_SAMPLES = 250
NUM_GIBBS_CHAINS = 20
KMER_SUBSAMPLING_RATE = 0.1
MAX_HAPLOTYPE_VARIANT_KMERS = 500
NOISE_RATE_PRIOR_SHAPE = 1.0
NOISE_RATE_PRIOR_SCALE = 0.01

# Hard filters (main.cpp:401-403; Filters.cpp:33).
MIN_GENOTYPE_POSTERIOR = 0.99
MIN_NUMBER_OF_KMERS = 1.0
OBSERVED_KMER_BETA = 0.275    # FAK threshold = 1 - exp(-beta * NB mean)

# Clustering / preprocessing defaults (main.cpp:129-137).
MIN_UNIT_VARIANTS = 5_000_000
MAX_ALLELE_LENGTH = 500_000
COPY_NUMBER_VARIANT_THRESHOLD = 0.5
MAX_SAMPLE_HAPLOTYPES = 32
MAX_SAMPLES = 30              # samples.tsv cap (main.cpp:72,188)

# Dirichlet concentration for haplotype frequencies (FrequencyDistribution.cpp:39).
DIRICHLET_PARAMETER = 1.0

# Noise estimation batch: number of single-cluster-group variants used
# (InferenceEngine.cpp, noise estimation batch size).
NOISE_ESTIMATION_VARIANTS = 100_000

# Sentinel for "missing" haplotype / allele indices (Utils::ushort_overflow).
MISSING = -1

# Ploidy encoding (Utils.hpp Ploidy enum).
PLOIDY_NULL = 0
PLOIDY_HAPLOID = 1
PLOIDY_DIPLOID = 2

# Gender encoding (Utils.hpp Gender enum).
GENDER_FEMALE = 0
GENDER_MALE = 1
