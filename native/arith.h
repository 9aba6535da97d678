#ifndef FQZ5_ARITH_H
#define FQZ5_ARITH_H

#include <cstdint>
#include <vector>

namespace fqz5 {
namespace arith {

std::vector<uint8_t> compress(const uint8_t* in, uint32_t in_size, int order);
bool uncompress(const uint8_t* in, uint32_t in_size,
                std::vector<uint8_t>& out, uint32_t out_hint = 0,
                bool know_size = false);

}  // namespace arith
}  // namespace fqz5

#endif  // FQZ5_ARITH_H
