/* runtime helpers normally provided by liborc */
#include <string.h>
void orc_memset (void *dest, int value, int n) { memset (dest, value, n); }
