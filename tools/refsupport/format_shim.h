// std::format shim for g++ 12 (no <format>): the reference's
// report_spectrum uses exactly one spec form, "{:10.5g} " (single double
// argument, harm_model.cpp:434-455).  Translate the spec to printf and
// delegate.  Injected via -include by tools/refbuild.sh; formatting-level
// differences in the last digit are irrelevant to the validation harness,
// which parses the numbers back.
#pragma once

#include <cstdio>
#include <string>

namespace std {

inline string format(const string &f, double v) {
    size_t b = f.find('{');
    size_t e = f.find('}', b);
    if (b == string::npos || e == string::npos) return f;
    string spec = f.substr(b + 1, e - b - 1);  // ":10.5g"
    string pf = "%" + (spec.empty() ? string("g") : spec.substr(1));
    char buf[128];
    snprintf(buf, sizeof buf, pf.c_str(), v);
    return f.substr(0, b) + buf + f.substr(e + 1);
}

}  // namespace std
