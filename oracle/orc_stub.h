/* minimal stub for <orc/orc.h> when building with DISABLE_ORC */
#ifndef ORC_STUB_H
#define ORC_STUB_H
#include <string.h>
#include <stdint.h>
typedef int8_t orc_int8; typedef int16_t orc_int16; typedef int32_t orc_int32; typedef int64_t orc_int64;
typedef uint8_t orc_uint8; typedef uint16_t orc_uint16; typedef uint32_t orc_uint32; typedef uint64_t orc_uint64;
#define orc_init()
#define orc_memcpy memcpy
#endif
