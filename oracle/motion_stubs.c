/* Stubs for orc-runtime-dependent motion renderers. Oracle must run with
 * SCHRO_MOTION_REF=1 so the scalar reference renderer is used. */
#include <stdio.h>
#include <stdlib.h>
typedef struct _SchroMotion SchroMotion;
typedef struct _SchroFrame SchroFrame;
void schro_motion_render_u8 (SchroMotion *m, SchroFrame *d, SchroFrame *a, int add, SchroFrame *o) {
  fprintf(stderr, "oracle: schro_motion_render_u8 called; set SCHRO_MOTION_REF=1\n");
  abort();
}
void schro_motion_render_fast (SchroMotion *m, SchroFrame *d, SchroFrame *a, int add, SchroFrame *o) { abort(); }
int schro_motion_render_fast_allowed (SchroMotion *m) { return 0; }
