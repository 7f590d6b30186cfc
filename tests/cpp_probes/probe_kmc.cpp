// Lists a KMC database through the reference's vendored kmc_api
// (kmc_file.cpp: OpenForListing + ReadNextKmer) — the exact code path the
// reference uses to ingest sample k-mer tables (KmerCounter.cpp:388-524).
// Prints "<kmer>\t<count>" per record in file order.
#include "kmc_file.h"
#include <cstdio>

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: probe_kmc <prefix>\n"); return 2; }
    CKMCFile db;
    if (!db.OpenForListing(argv[1])) {
        std::fprintf(stderr, "OpenForListing failed\n");
        return 1;
    }
    CKmerAPI kmer(db.KmerLength());
    uint32 count;
    while (db.ReadNextKmer(kmer, count)) {
        std::printf("%s\t%u\n", kmer.to_string().c_str(), count);
    }
    return 0;
}
