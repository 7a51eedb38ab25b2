// Plain-argv replacement for the reference's abseil main (main.cpp:26-56),
// driving the SAME pipeline: ctor -> read_file -> init -> rng init ->
// run_simulation -> report_spectrum.  Built by tools/refbuild.sh against
// the unmodified reference TUs; used only by the validation harness
// (tests/test_vs_reference.py) to produce ground-truth spectra.
#include <cstdlib>
#include <iostream>
#include <string>

#include "cuda_grmonty/consts.hpp"
#include "cuda_grmonty/harm_model.hpp"
#include "cuda_grmonty/monty_rand.hpp"
#include "spdlog/spdlog.h"

int main(int argc, char *argv[]) {
    if (argc < 5) {
        std::cerr << "usage: ref_grmonty <photon_n> <mass_unit> <dump> "
                     "<spectrum_out> [debug]\n";
        return 2;
    }
    int photon_n = std::atoi(argv[1]);
    double mass_unit = std::atof(argv[2]);
    std::string dump = argv[3];
    std::string out = argv[4];
    spdlog::set_level(argc > 5 ? spdlog::level::debug : spdlog::level::info);

    harm::HARMModel model(photon_n, mass_unit);
    model.read_file(dump);
    model.init();
    monty_rand::init(consts::rng_seed);
    model.run_simulation();
    model.report_spectrum(out);
    return 0;
}
