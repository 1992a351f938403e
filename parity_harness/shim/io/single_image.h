/* Empty shim (included transitively by reference headers). */
#ifndef SHIM_SINGLE_IMAGE_H
#define SHIM_SINGLE_IMAGE_H
#endif
