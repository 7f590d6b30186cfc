// Writes/reads reference KmerBloom artifacts through the reference's own
// vendored code (src/kmerBloom/KmerBloom.cpp save/load, KmerBloom.cpp:63-164,
// over the ntHash BloomFilter). k-mer strings come in on stdin, one per line.
//   probe_bloom write <prefix>   -> builds a bloom from stdin kmers, saves it
//   probe_bloom read  <prefix>   -> prints lookup(kmer) as 0/1 per stdin kmer
#include "kmerBloom/KmerBloom.hpp"
#include <iostream>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 3) { std::cerr << "usage: probe_bloom write|read <prefix>\n"; return 2; }
    std::string mode = argv[1], prefix = argv[2];
    std::vector<std::string> kmers;
    std::string line;
    while (std::getline(std::cin, line))
        if (!line.empty()) kmers.push_back(line);
    if (mode == "write") {
        KmerBloom<BT_KMER_SIZE> bloom(static_cast<uint64_t>(kmers.size()), 0.001f);
        for (const auto& s : kmers) bloom.addKmer(s);
        bloom.save(prefix);
    } else {
        KmerBloom<BT_KMER_SIZE> bloom(prefix);
        for (const auto& s : kmers) std::cout << (bloom.lookup(s) ? 1 : 0) << "\n";
    }
    return 0;
}
