/* Shim for gui/callbacks.h: demosaicing.c includes it but the functions the
 * harness exercises (debayer_buffer and the 5 bayer_* kernels) use nothing
 * from it. Empty on purpose. */
#ifndef SHIM_GUI_CALLBACKS_H
#define SHIM_GUI_CALLBACKS_H
#endif
