// Minimal spdlog-compatible stub for building the reference CPU backend
// WITHOUT its Bazel dependency tree (validation harness only; see
// tools/refbuild.sh).  Implements the subset the reference TUs use:
// set_level + debug/info/warn/error with "{}"-style placeholders (format
// specs inside the braces are ignored — log text is not part of the
// validated output; the spectrum file is written by the reference's own
// ofstream code).
#pragma once

#include <iostream>
#include <sstream>
#include <string>
#include <utility>

namespace spdlog {

namespace level {
enum level_enum { trace = 0, debug, info, warn, err, critical, off };
}  // namespace level

inline level::level_enum &_lvl() {
    static level::level_enum l = level::info;
    return l;
}

inline void set_level(level::level_enum l) { _lvl() = l; }

inline void _fmt(std::ostringstream &os, const std::string &f, size_t pos) {
    os << f.substr(pos);
}

template <typename T, typename... Ts>
inline void _fmt(std::ostringstream &os, const std::string &f, size_t pos,
                 T &&v, Ts &&...rest) {
    size_t b = f.find('{', pos);
    if (b == std::string::npos) {
        os << f.substr(pos);
        return;
    }
    size_t e = f.find('}', b);
    os << f.substr(pos, b - pos) << v;
    _fmt(os, f, e == std::string::npos ? f.size() : e + 1,
         std::forward<Ts>(rest)...);
}

template <typename... Ts>
inline void _log(const char *tag, level::level_enum l, const std::string &f,
                 Ts &&...args) {
    if (l < _lvl()) return;
    std::ostringstream os;
    _fmt(os, f, 0, std::forward<Ts>(args)...);
    std::cerr << "[" << tag << "] " << os.str() << "\n";
}

template <typename... Ts>
inline void debug(const std::string &f, Ts &&...a) {
    _log("debug", level::debug, f, std::forward<Ts>(a)...);
}
template <typename... Ts>
inline void info(const std::string &f, Ts &&...a) {
    _log("info", level::info, f, std::forward<Ts>(a)...);
}
template <typename... Ts>
inline void warn(const std::string &f, Ts &&...a) {
    _log("warn", level::warn, f, std::forward<Ts>(a)...);
}
template <typename... Ts>
inline void error(const std::string &f, Ts &&...a) {
    _log("error", level::err, f, std::forward<Ts>(a)...);
}

}  // namespace spdlog
